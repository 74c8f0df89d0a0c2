"""Registry entry: the end-to-end corpus-prep pipeline as ONE plan.

The brief's training-data pipeline, composed from the engine's own
operators — quality gate → exact-dedup keep-first → contextual chunking
→ per-source stats — in a single declarative DataFrame chain. Catalyst
fuses the filter+window+explode into three stages (one shuffle for the
dedup window, one for the final agg); nothing touches the driver. This
is the "user of the reference switches to this repo" query: what the
reference's seven spark-submit scripts + pandas stages did, minus the
CSV hops, in one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.text import (
    normalize_text,
    token_count,
)
from qa_data_pipeline_rag_llm_spark.operators.chunking import chunk_text
from qa_data_pipeline_rag_llm_spark.plans import oracle_fragments as O
from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register


@register(
    "corpus_prep_pipeline",
    f"""
    WITH kept AS (
      SELECT doc_id, source, text FROM (
        SELECT doc_id, source, text,
               ROW_NUMBER() OVER (PARTITION BY md5({O.norm("text")})
                                  ORDER BY doc_id) AS rn
        FROM documents
        WHERE {O.token_count("text")} BETWEEN 5 AND 2000
          AND n_chars >= 60) WHERE rn = 1),
    ch AS (
      SELECT k.doc_id, k.source, i,
             substr(k.text, CAST(1 + i * 90 AS INT), 120) AS chunk_text
      FROM (SELECT doc_id, source, text,
                   CAST(greatest(1, (length(text) - 30 + 89) // 90) AS INT) AS nc
            FROM kept) k,
           LATERAL unnest(range(k.nc)) AS t(i))
    SELECT source,
           CAST(SUM(CASE WHEN i = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
           COUNT(*) AS n_chunks,
           CAST(SUM({O.token_count("chunk_text")}) AS BIGINT) AS total_tokens
    FROM ch GROUP BY source
    """,
    bench=True,
    doc="End-to-end corpus prep in one plan: token/length quality gate → "
    "exact-dedup keep-first (normalized-text hash, deterministic min "
    "doc_id survivor) → overlapping chunking → per-source doc/chunk/"
    "token stats. Two shuffles total (dedup window, final agg); the "
    "reference needed 7 spark-submit stages + pandas + CSV hops for "
    "less (main-spark.py:4-10).",
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # normalize ONCE and derive both the token gate and the dedup
    # fingerprint from it — token_count(text) + md5(normalize(text))
    # would run the [\W_]+ regex over every document twice (the regex
    # is the pipeline's hottest expression: sharing it is worth ~10%
    # of the whole query at sf0.1)
    d2 = d.select(
        "doc_id", "source", "text", "n_chars",
        normalize_text("text").alias("__norm"),
    )
    tc = F.when(F.length("__norm") == 0, F.lit(0)).otherwise(
        F.size(F.split(F.col("__norm"), " "))
    )
    quality = d2.filter(tc.between(5, 2000) & (F.col("n_chars") >= 60))
    w = Window.partitionBy(F.md5(F.col("__norm"))).orderBy("doc_id")
    kept = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "text")
    )
    chunks = chunk_text(kept, "text", chunk_size=120, stride=90)
    # every kept doc emits exactly one chunk_id=0 row, so the doc count
    # is a plain conditional SUM — count_distinct(doc_id) planned a
    # second aggregate pass (partial distinct on (source, doc_id) before
    # the final agg) for the same number
    return chunks.groupBy("source").agg(
        F.sum(F.when(F.col("chunk_id") == 0, 1).otherwise(0)).alias("n_docs"),
        F.count("*").alias("n_chunks"),
        F.sum(token_count("chunk_text")).alias("total_tokens"),
    )
