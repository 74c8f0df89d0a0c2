"""Registry entries: remaining serving-path surface (S8 + M5).

  * ``catalog_tables`` — S8: the reference lists MinIO bucket prefixes to
    enumerate "themes" (app.py:118-133, app2.py:77-83); the engine
    equivalent is a catalog/filesystem listing surfaced as a DataFrame.
  * ``rag_generate`` — M5 end-to-end: retrieval (rag_retrieve's plan) →
    grounded prompt assembly in columns → batch generation pandas_udf.
    With the deterministic fake client the whole pipeline — including
    prompt text — hash-matches the DuckDB oracle; a real endpoint swaps
    in behind functions/llm.generate_text unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.llm import (
    generate_text,
    oracle_generate,
)
from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY, _t, register


@register(
    "catalog_tables",
    """
    SELECT table_name FROM (VALUES ('customer'), ('documents'), ('embeddings'),
      ('events'), ('lineitem'), ('nation'), ('orders'), ('part'), ('region'),
      ('supplier')) AS t(table_name)
    """,
    doc="S8 namespace listing (app.py:118-133 lists bucket prefixes as "
    "'themes'): enumerate the tables visible in a data directory. A "
    "driver-side metadata op by nature — same as spark.catalog."
    "listTables — surfaced as a DataFrame for composability.",
)
def catalog_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = sorted(
        f[: -len(".parquet")]
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    return spark.createDataFrame([(n,) for n in names], "table_name string")


@register(
    "rag_generate",
    f"""
    WITH retrieved AS ({{rag}}),
    assembled AS (
      SELECT COUNT(*) AS n_docs,
             'Answer from context.' || chr(10) || 'Context:' || chr(10) ||
               coalesce(string_agg(d.text, chr(10) || chr(10)
                                   ORDER BY r.rank), '') AS prompt
      FROM retrieved r JOIN documents d ON d.doc_id = r.doc_id)
    SELECT n_docs, CAST(length(prompt) AS BIGINT) AS prompt_chars,
           {oracle_generate("prompt")} AS answer
    FROM assembled
    """,
    doc="M5 grounded generation (PLATFORM-GenerationLLM.py:183-211 / "
    "app2.py:166-178 as ONE plan): top-k retrieval → rank-ordered "
    "context concat → batched pandas_udf generation. The reference "
    "loops prompts on the driver; here generation parallelizes per "
    "Arrow batch across executors.",
)
def rag_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    retrieved = REGISTRY["rag_retrieve"].spark(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    assembled = (
        retrieved.join(docs, "doc_id")
        .groupBy()
        .agg(
            F.count("*").alias("n_docs"),
            F.concat(
                F.lit("Answer from context.\nContext:\n"),
                F.concat_ws(
                    "\n\n",
                    F.array_sort(
                        F.collect_list(F.struct("rank", "text"))
                    ).text,
                ),
            ).alias("prompt"),
        )
    )
    return assembled.select(
        "n_docs",
        F.length("prompt").cast("long").alias("prompt_chars"),
        generate_text(F.col("prompt")).alias("answer"),
    )


# Inject rag_retrieve's oracle as a CTE body (it is itself a WITH query;
# DuckDB allows a full WITH-query inside a parenthesized CTE definition
# only via subquery form, so wrap it).
REGISTRY["rag_generate"].oracle = REGISTRY["rag_generate"].oracle.format(
    rag=f"SELECT * FROM ({REGISTRY['rag_retrieve'].oracle})"
)
