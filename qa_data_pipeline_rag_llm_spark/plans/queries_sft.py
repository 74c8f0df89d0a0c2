"""Registry entries: alignment-data preparation (preference pairs, SFT
prompt/response assembly).

The reference's serving path builds (context, question) prompts for a
generator (``/root/reference/app2.py:47-76``); a production alignment
pipeline also needs the TRAINING side of that loop — this module adds
the reward-model data-prep shapes over the driver's testdata:

  * ``preference_pairs_documents`` — per (source, lang) stratum, the
    best-vs-worst document by the engine's quality score as a
    (chosen, rejected) preference pair — the DPO/RLHF data shape, with
    fully deterministic tie-breaks so the pair table is reproducible.
  * ``sft_examples_documents`` — prompt/response assembly with the
    chat-template concat the reference does driver-side (F3), emitted
    with exact token budgets so a packing step can consume it directly.

Scale notes: preference pairing is ONE partial-agg shuffle (struct
min/max per stratum — no window, no self-join); SFT assembly is a
shuffle-free projection plus the existing quality gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.text import (
    bpe_token_count,
    o_bpe_token_count,
    quality_score,
)
from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register
from qa_data_pipeline_rag_llm_spark.plans.queries_text import _quality_sql

PREF_MIN_GAP = 0.05  # a pair teaches nothing when the margin is noise


@register(
    "preference_pairs_documents",
    f"""
    WITH q AS ({_quality_sql("doc_id, source, lang")})
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           (array_agg(doc_id ORDER BY quality DESC, doc_id ASC))[1]
             AS chosen_doc,
           (array_agg(doc_id ORDER BY quality ASC, doc_id DESC))[1]
             AS rejected_doc,
           round(max(quality) - min(quality), 6) AS quality_gap
    FROM q
    GROUP BY source, lang
    HAVING COUNT(*) >= 2
       AND round(max(quality) - min(quality), 6) >= {PREF_MIN_GAP}
    """,
    doc="Reward-model data prep (DPO/RLHF shape): per (source, lang) "
    "stratum, pair the highest-quality document (chosen) against the "
    "lowest (rejected), keeping only strata where the quality margin "
    f"clears {PREF_MIN_GAP} — margin-less pairs are label noise. "
    "Deterministic tie-breaks (lowest id wins chosen, highest id wins "
    "rejected) make the pair table reproducible run to run. One "
    "partial-agg shuffle: chosen/rejected are struct max/min per "
    "stratum — no window over the corpus, no self-join; the same shape "
    "at 100 TB with per-stratum skew handled by AQE.",
)
def preference_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    q = d.select("doc_id", "source", "lang", quality_score("text").alias("q"))
    # max(struct(q, -id)) = best quality, ties → lowest id;
    # min(struct(q, -id)) = worst quality, ties → highest id.
    keyed = q.select(
        "source",
        "lang",
        F.struct(F.col("q"), (-F.col("doc_id")).alias("nid"), F.col("doc_id"))
        .alias("s"),
    )
    agg = keyed.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.max("s").alias("best"),
        F.min("s").alias("worst"),
    )
    return (
        agg.filter(F.col("n_docs") >= 2)
        .select(
            "source",
            "lang",
            "n_docs",
            F.col("best.doc_id").alias("chosen_doc"),
            F.col("worst.doc_id").alias("rejected_doc"),
            F.round(F.col("best.q") - F.col("worst.q"), 6).alias(
                "quality_gap"
            ),
        )
        .filter(F.col("quality_gap") >= PREF_MIN_GAP)
    )


SFT_MIN_QUALITY = 0.5
SFT_PROMPT_CHARS = 80


@register(
    "sft_examples_documents",
    f"""
    WITH q AS ({_quality_sql("doc_id")})
    SELECT d.doc_id,
           'Instruct: summarize the following document.' || chr(10)
             || substr(coalesce(d.text, ''), 1, {SFT_PROMPT_CHARS}) AS prompt,
           coalesce(d.text, '') AS response,
           CAST({o_bpe_token_count("d.text")} AS BIGINT) AS response_tokens
    FROM documents d JOIN q USING (doc_id)
    WHERE q.quality >= {SFT_MIN_QUALITY}
    """,
    doc="SFT example assembly: quality-gated documents rendered into the "
    "prompt/response template shape (the chat-template concat the "
    "reference builds driver-side, app2.py:47-76 / F3), with the exact "
    "BPE token budget per response so pack_documents_blocks can consume "
    "the output directly. Shuffle-free projection over the quality "
    "gate — embarrassingly parallel at any scale.",
)
def sft_examples_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    text = F.coalesce(F.col("text"), F.lit(""))
    return (
        d.filter(quality_score("text") >= SFT_MIN_QUALITY)
        .select(
            "doc_id",
            F.concat(
                F.lit("Instruct: summarize the following document.\n"),
                F.substring(text, 1, SFT_PROMPT_CHARS),
            ).alias("prompt"),
            text.alias("response"),
            bpe_token_count("text").cast("long").alias("response_tokens"),
        )
    )
