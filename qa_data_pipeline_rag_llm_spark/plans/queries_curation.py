"""Registry entries: corpus-curation DECISIONS over ``documents`` /
``embeddings``.

The dedup/text families measure; this module decides — the four judgments
a training-data curator actually ships (task-brief extension surface; the
reference's only curation step is drop-by-id + regex filters,
``/root/reference/REDDIT-Nettoyage-Posts.py``):

  * span-level duplication burden per document (RefinedWeb/C4-style
    "duplicated n-gram fraction") and the resulting drop flag,
  * a Gopher-style rule filter (hard boolean quality rules, not the
    weighted score of ``text_stats_documents``),
  * kNN label purity — the retrieval-quality eval for an embedding space,
  * per-source mixture reweighting toward a uniform token budget.

Scale notes: span-dup shuffles on a 32-bit gram hash (narrow rows), never
materializes pairs; the rule filter is a shuffle-free projection; kNN
purity reuses the broadcast-probe cosine scan (probe set is the bounded
side); mixture weights aggregate to one row per source before the
single-partition window (bounded by source cardinality, like
``revenue_share_by_nation``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.hashing import stable_int32
from qa_data_pipeline_rag_llm_spark.functions.text import (
    bpe_token_count,
    o_bpe_token_count,
    stopword_hits,
    token_count,
    tokens,
    word_shingles,
)
from qa_data_pipeline_rag_llm_spark.operators.similarity import cosine_topk
from qa_data_pipeline_rag_llm_spark.plans import oracle_fragments as O
from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register
from qa_data_pipeline_rag_llm_spark.plans.queries_vector import _O_COS

SPAN_N = 8           # span width (words) for cross-doc duplication burden
SPAN_DUP_T = 0.2     # drop when more than 20% of a doc's spans are shared
KNN_PROBES = 25      # purity eval sample: vec_id < 25 (deterministic)
KNN_K = 10


@register(
    "span_dup_fraction_documents",
    f"""
    WITH occ AS (
      SELECT doc_id, {O.stable_int32("g")} AS g
      FROM (SELECT doc_id, unnest({O.shingles("text", SPAN_N)}) AS g
            FROM documents)),
    df AS (
      SELECT g, COUNT(DISTINCT doc_id) AS df
      FROM occ GROUP BY g),
    per_doc AS (
      SELECT o.doc_id,
             COUNT(*) AS n_spans,
             SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS dup_spans
      FROM occ o JOIN df USING (g)
      GROUP BY o.doc_id)
    SELECT doc_id,
           CAST(n_spans AS BIGINT) AS n_spans,
           CAST(dup_spans AS BIGINT) AS dup_spans,
           round(dup_spans * 1.0 / n_spans, 6) AS dup_frac,
           round(dup_spans * 1.0 / n_spans, 6) > {SPAN_DUP_T} AS flagged
    FROM per_doc
    """,
    doc="Span-level duplication burden (RefinedWeb-style): fraction of a "
    "doc's word 8-grams that appear in at least one OTHER document, and "
    "the drop flag at 20%. Complements minhash_near_dups (whole-doc "
    "pairs) and repetition_stats (intra-doc): this is the cross-doc "
    "boilerplate signal. Exact document frequency over 32-bit gram "
    "hashes — narrow shuffle rows, no pair materialization, linear at "
    "corpus scale.",
)
def span_dup_fraction_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 restructure: the original plan computed the exploded shingle
    # subtree TWICE (once under distinct→groupBy for document frequency,
    # once as the probe side of an occ⋈df join) and shuffled the full
    # span table through that join. One groupBy(g, doc_id) with map-side
    # combine collapses intra-doc repeats while keeping their count, a
    # count window over g IS the distinct-doc frequency (rows of the
    # deduped pair frame), and the per-doc rollup weights by cnt — same
    # rows out (oracle unchanged), one explode, no join: 7.8 → 4.3 s at
    # sf0.1 before the word_shingles kernel change, ~1.5 s after.
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    occ = d.select(
        "doc_id",
        F.explode(word_shingles("text", SPAN_N)).alias("gram"),
    ).select("doc_id", stable_int32("gram").alias("g"))
    pairs = occ.groupBy("g", "doc_id").agg(F.count("*").alias("cnt"))
    df_w = F.count("*").over(Window.partitionBy("g"))
    per_doc = (
        pairs.withColumn("df", df_w)
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_spans"),
            F.sum(
                F.when(F.col("df") >= 2, F.col("cnt")).otherwise(0)
            ).alias("dup_spans"),
        )
    )
    dup_frac = F.round(F.col("dup_spans") * 1.0 / F.col("n_spans"), 6)
    return per_doc.select(
        "doc_id",
        "n_spans",
        "dup_spans",
        dup_frac.alias("dup_frac"),
        (dup_frac > SPAN_DUP_T).alias("flagged"),
    )


# Gopher-style hard rule thresholds (Rae et al. 2021 §A1.1, adapted to the
# corpus' scale: its docs are 20-60 words, so the word-count band is
# proportionally tighter than the paper's 50-100k).
G_MIN_WORDS, G_MAX_WORDS = 20, 1000
G_MIN_MEAN_LEN, G_MAX_MEAN_LEN = 2.0, 10.0
G_MAX_SYMBOL_FRAC = 0.1
G_MIN_ALPHA_FRAC = 0.7
G_MIN_STOP_HITS = 2


@register(
    "gopher_quality_documents",
    f"""
    WITH s AS (
      SELECT doc_id,
             {O.token_count("text")} AS n_tokens,
             coalesce(list_aggregate(
               list_transform({O.toks("text")}, x -> len(x)), 'sum'), 0)
               AS sum_len,
             len(coalesce(text, '')) AS raw_len,
             len(regexp_replace(lower(coalesce(text, '')),
                                '[^a-z0-9 ]', '', 'g')) AS kept_len,
             len(list_filter({O.toks("text")},
                             x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
             {O.stopword_hits("text", "en")} AS stop_hits
      FROM documents),
    m AS (
      SELECT doc_id, n_tokens, stop_hits,
             CASE WHEN n_tokens > 0
                  THEN round(sum_len * 1.0 / n_tokens, 6) ELSE 0.0 END
               AS mean_word_len,
             CASE WHEN raw_len > 0
                  THEN round((raw_len - kept_len) * 1.0 / raw_len, 6)
                  ELSE 0.0 END AS symbol_frac,
             CASE WHEN n_tokens > 0
                  THEN round(alpha_words * 1.0 / n_tokens, 6) ELSE 0.0 END
               AS alpha_word_frac
      FROM s)
    SELECT doc_id, n_tokens, mean_word_len, symbol_frac, alpha_word_frac,
           stop_hits,
           n_tokens BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS} AS pass_len,
           mean_word_len BETWEEN {G_MIN_MEAN_LEN} AND {G_MAX_MEAN_LEN}
             AS pass_word_len,
           symbol_frac < {G_MAX_SYMBOL_FRAC} AS pass_symbol,
           alpha_word_frac >= {G_MIN_ALPHA_FRAC} AS pass_alpha,
           stop_hits >= {G_MIN_STOP_HITS} AS pass_stop,
           (n_tokens BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS})
             AND (mean_word_len BETWEEN {G_MIN_MEAN_LEN} AND {G_MAX_MEAN_LEN})
             AND symbol_frac < {G_MAX_SYMBOL_FRAC}
             AND alpha_word_frac >= {G_MIN_ALPHA_FRAC}
             AND stop_hits >= {G_MIN_STOP_HITS} AS keep
    FROM m
    """,
    doc="Gopher-style HARD rule filter (word-count band, mean word "
    "length, symbol ratio, alphabetic-word fraction, stopword "
    "presence) with per-rule verdicts — the audit view a curator uses "
    "to see WHY a doc was dropped. Boolean rules, not the weighted "
    "score of text_stats_documents. Shuffle-free codegen'd projection; "
    "rules evaluate the rounded metrics so both engines decide "
    "identical boundaries.",
)
def gopher_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_verdict(_t(spark, sf_dir, "documents"))


def gopher_verdict(d: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """The Gopher rule projection on any (doc_id, text) frame — a pure
    per-row expression (no shuffle, no state), so it is equally legal on
    a batch table and MID-STREAM (streaming_quality_gate reuses it
    verbatim as admission control). ``carry`` names extra input columns
    to pass through unchanged (e.g. ``("source",)`` for per-source
    agreement audits) so callers never need a doc_id re-join to recover
    attributes the projection dropped."""
    t = tokens("text")
    n = token_count("text")
    raw_len = F.length(F.coalesce(F.col("text"), F.lit("")))
    kept_len = F.length(
        F.regexp_replace(
            F.lower(F.coalesce(F.col("text"), F.lit(""))), "[^a-z0-9 ]", ""
        )
    )
    sum_len = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    alpha_words = F.size(F.filter(t, lambda x: x.rlike("[a-z]")))
    m = d.select(
        "doc_id",
        *carry,
        n.alias("n_tokens"),
        sum_len.alias("sum_len"),
        raw_len.alias("raw_len"),
        kept_len.alias("kept_len"),
        alpha_words.alias("alpha_words"),
        stopword_hits("text", "en").alias("stop_hits"),
    ).select(
        "doc_id",
        *carry,
        "n_tokens",
        "stop_hits",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("sum_len") * 1.0 / F.col("n_tokens"), 6),
        )
        .otherwise(0.0)
        .alias("mean_word_len"),
        F.when(
            F.col("raw_len") > 0,
            F.round(
                (F.col("raw_len") - F.col("kept_len")) * 1.0 / F.col("raw_len"),
                6,
            ),
        )
        .otherwise(0.0)
        .alias("symbol_frac"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("alpha_words") * 1.0 / F.col("n_tokens"), 6),
        )
        .otherwise(0.0)
        .alias("alpha_word_frac"),
    )
    pass_len = F.col("n_tokens").between(G_MIN_WORDS, G_MAX_WORDS)
    pass_word_len = F.col("mean_word_len").between(G_MIN_MEAN_LEN, G_MAX_MEAN_LEN)
    pass_symbol = F.col("symbol_frac") < G_MAX_SYMBOL_FRAC
    pass_alpha = F.col("alpha_word_frac") >= G_MIN_ALPHA_FRAC
    pass_stop = F.col("stop_hits") >= G_MIN_STOP_HITS
    return m.select(
        "doc_id",
        *carry,
        "n_tokens",
        "mean_word_len",
        "symbol_frac",
        "alpha_word_frac",
        "stop_hits",
        pass_len.alias("pass_len"),
        pass_word_len.alias("pass_word_len"),
        pass_symbol.alias("pass_symbol"),
        pass_alpha.alias("pass_alpha"),
        pass_stop.alias("pass_stop"),
        (pass_len & pass_word_len & pass_symbol & pass_alpha & pass_stop).alias(
            "keep"
        ),
    )


@register(
    "knn_label_purity_embeddings",
    f"""
    WITH scored AS (
      SELECT p.vec_id AS probe_id, p.label AS probe_label,
             e.vec_id, e.label AS nb_label, {_O_COS} AS sim
      FROM embeddings e
      JOIN embeddings p ON p.vec_id < {KNN_PROBES} AND e.vec_id != p.vec_id),
    topk AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                     ORDER BY sim DESC, vec_id) AS rank
        FROM scored) WHERE rank <= {KNN_K})
    SELECT probe_id, probe_label,
           CAST(COUNT(*) AS BIGINT) AS k_eff,
           CAST(SUM(CASE WHEN nb_label = probe_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_same,
           round(SUM(CASE WHEN nb_label = probe_label THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS purity
    FROM topk GROUP BY probe_id, probe_label
    """,
    doc="kNN label purity — the embedding-space quality eval: for each "
    "probe, what fraction of its exact top-10 cosine neighbors share "
    "its label. High purity = the space clusters by label = retrieval "
    "will surface same-topic docs. Reuses the broadcast-probe cosine "
    "scan (operators/similarity.cosine_topk); the probe sample is the "
    "bounded side, so the eval costs one linear scan regardless of "
    "corpus size.",
)
def knn_label_purity_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < KNN_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        F.col("label").alias("probe_label"),
    )
    topk = cosine_topk(
        emb, probes.select("probe_id", "probe_vec"), k=KNN_K
    )
    labeled = (
        emb.select("vec_id", F.col("label").alias("nb_label"))
        .join(F.broadcast(topk), "vec_id")
        .join(
            F.broadcast(probes.select("probe_id", "probe_label")), "probe_id"
        )
    )
    same = F.when(F.col("nb_label") == F.col("probe_label"), 1).otherwise(0)
    return labeled.groupBy("probe_id", "probe_label").agg(
        F.count("*").alias("k_eff"),
        F.sum(same).alias("n_same"),
        F.round(F.sum(same) * 1.0 / F.count("*"), 6).alias("purity"),
    )


@register(
    "mixture_weights_by_source",
    f"""
    WITH per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(bpe) AS BIGINT) AS bpe_tokens
      FROM (SELECT source, {o_bpe_token_count("text")} AS bpe
            FROM documents)
      GROUP BY source)
    SELECT source, n_docs, bpe_tokens,
           round(bpe_tokens * 1.0 / SUM(bpe_tokens) OVER (), 6)
             AS token_share,
           round((SUM(bpe_tokens) OVER () * 1.0 / COUNT(*) OVER ())
                 / bpe_tokens, 6) AS sample_weight,
           CAST(round(SUM(bpe_tokens) OVER () * 1.0 / COUNT(*) OVER ())
                AS BIGINT) AS target_tokens
    FROM per
    """,
    doc="Per-source mixture reweighting toward a uniform token budget: "
    "actual token share, the sampling weight (>1 = upsample, <1 = "
    "downsample) that equalizes the mixture, and the per-source target "
    "token count. The knob a training-mix planner turns after "
    "bpe_token_budget_documents measures. One map-side-combinable agg; "
    "the window runs over one row per source (bounded cardinality).",
)
def mixture_weights_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    per = d.select("source", bpe_token_count("text").alias("bpe")).groupBy(
        "source"
    ).agg(F.count("*").alias("n_docs"), F.sum("bpe").alias("bpe_tokens"))
    w = Window.partitionBy()
    tot = F.sum("bpe_tokens").over(w)
    nsrc = F.count("*").over(w)
    target = tot * 1.0 / nsrc
    # ANSI-safe: an all-empty source (or corpus) makes a divisor 0 —
    # Spark would throw where the DuckDB oracle yields NULL (review r03
    # class); the when-guards reproduce the oracle's NULL
    return per.select(
        "source",
        "n_docs",
        "bpe_tokens",
        F.round(
            F.col("bpe_tokens") * 1.0 / F.when(tot != 0, tot), 6
        ).alias("token_share"),
        F.round(
            target
            / F.when(F.col("bpe_tokens") != 0, F.col("bpe_tokens")),
            6,
        ).alias("sample_weight"),
        F.round(target).cast("long").alias("target_tokens"),
    )
