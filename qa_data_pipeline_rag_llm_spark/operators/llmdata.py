"""LLM-training-data curation operators: PII redaction, decontamination,
repetition filtering, TF-IDF keyword retrieval.

The reference prepares RAG corpora but stops at dedup-by-id and regex
bot-filters (``/root/reference/REDDIT-Nettoyage-Comms.py:76-88``,
``REDDIT-Ingestion.py:116-121``); a production pipeline also needs the
curation passes below before text reaches a trainer. All are pure
DataFrame compositions — codegen'd regex/HOF projections plus bounded
joins — and every one is DuckDB-oracle-checkable.

Scale shapes (100 TB):

* ``pii_redact``          — shuffle-free projection (regex in codegen).
* ``decontaminate``       — eval-set shingles are tiny by contract
  (benchmarks are MBs, corpora are TBs) → broadcast semi-ish join, one
  shuffle for the per-doc overlap count.
* ``repetition_stats``    — one explode + two-level partial agg on
  (doc, gram); no cross-doc traffic.
* ``tfidf_topk``          — df counts are one global agg (rows = 1,
  broadcast back); scoring is a projection; only the final top-k ranks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.text import (
    token_count,
    tokens,
    word_shingles,
)

# Dialect-portable patterns (identical semantics in Java regex and RE2):
# no lookaround, no \p classes, explicit character sets.
# explicit A-Za-z ranges, NOT (?i): Java case-folds ASCII-only under (?i)
# while RE2 Unicode-folds (ſ/K would diverge) — explicit ranges are
# identical in both engines AND catch mixed-case emails (review r03)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{4}\b"


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Redact emails/phone-like tokens; count what was removed.

    Returns (id, n_emails, n_phones, redacted). One codegen'd projection —
    the redaction never shuffles and scales linearly with the scan.
    """
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0))).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: training docs sharing ≥1 word ``shingle_n``-gram
    with any eval document, with the count of distinct overlapping grams.

    The GPT-3/PaLM-style n-gram overlap check as a relational plan: distinct
    (doc, gram) on both sides, inner join on gram (eval side broadcast — eval
    suites are small by contract), count per training doc. Returned docs are
    the ones a trainer must drop.
    """
    tr = (
        train.select(F.col(id_col), F.explode(word_shingles(text_col, shingle_n)).alias("g"))
        .distinct()
    )
    ev = (
        eval_set.select(F.explode(word_shingles(text_col, shingle_n)).alias("g"))
        .distinct()
    )
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap_grams"))
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-document repetition measures (Gopher-style repetition filter):
    token count, distinct-token count, duplicate-token ratio, and the
    coverage fraction of the single most frequent word bigram.

    (id, n_tokens, n_distinct, dup_ratio, top_bigram_n, top_bigram_frac).
    ``max(count)`` per doc needs no tie-break — the max is unique even when
    several grams attain it.
    """
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )
    top = (
        df.select(F.col(id_col), F.explode(word_shingles(text_col, 2)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_bigram_n"))
    )
    return base.join(top, id_col).select(
        id_col,
        "n_tokens",
        "n_distinct",
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                1.0 - F.col("n_distinct") / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_ratio"),
        "top_bigram_n",
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                2.0 * F.col("top_bigram_n") / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_frac"),
    )


def tfidf_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by TF·IDF for a fixed keyword set.

    score(d) = Σ_t  count(t in d) · ln(N / df_t), rounded to 6 — ranking is
    on the ROUNDED score (+ id tie-break) so order is deterministic across
    engines. The corpus stats (N, one df per term) are a single global
    aggregate — one row — cross-joined back (broadcast); scoring itself is a
    shuffle-free projection and only the final top-k ranks.
    """
    toks = tokens(text_col)
    d = df.select(F.col(id_col), toks.alias("_t"))
    stats = d.agg(
        F.count("*").cast("double").alias("_n"),
        *[
            F.sum(F.array_contains("_t", t).cast("long"))
            .cast("double")
            .alias(f"_df{i}")
            for i, t in enumerate(terms)
        ],
    )
    score: Column = F.lit(0.0)
    for i, t in enumerate(terms):
        tf = F.size(F.filter("_t", lambda x: x == F.lit(t))).cast("double")
        # df=0 (term absent from the corpus) would make log(n/0)=inf and
        # 0*inf=NaN poison EVERY document's score (NaN sorts above all
        # reals under DESC) — an absent term contributes nothing instead
        # (review r03)
        score = score + F.when(
            F.col(f"_df{i}") > 0,
            tf * F.log(F.col("_n") / F.col(f"_df{i}")),
        ).otherwise(0.0)
    scored = d.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), F.round(score, 6).alias("score")
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k +
    # driver merge of k·P rows) — no global sort shuffle; the rank window
    # then touches only k rows.
    top = scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", id_col, "score"
    )
