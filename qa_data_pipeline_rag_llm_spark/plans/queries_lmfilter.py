"""Registry entries: LM-perplexity quality filtering over ``documents``.

The CCNet recipe (Wenzek et al. 2020) scores every document by the
cross-entropy of a language model and gates/buckets on it — the single
most-used quality signal in web-scale pretraining corpora, and one the
reference pipeline (fixed scalar thresholds,
``/root/reference/STACK-Ingestion.py:30``) has no analogue of. Here the
model is an add-½-smoothed UNIGRAM LM trained on the corpus itself in
the same plan (self-surprisal): documents whose token distribution
diverges from the corpus — boilerplate, key-mash, non-language,
templated spam — score high; suspiciously low scorers are
near-degenerate repetitions. No external model, no network, exactly
reproducible. (Complements ``bigram_logprob_documents`` — the per-doc
bigram conditional-log-prob scorer: this module adds the per-SOURCE
profile grain, the clean-slice reference LM with OOV accounting, the
heuristic-vs-LM agreement audit, and the cross-source KL matrix.)

Determinism (the zipf_slope/token_entropy discipline): each token's
log-probability is rounded ONCE to a 1e-9-scaled long
(``ln(2·c_w + 1)``, ``ln(2·N + V)`` — exact-integer arguments), so
every downstream sum is integer/decimal arithmetic — order-free,
replayable bit-for-bit by the DuckDB twins. Per-doc totals convert to
micro-nats through one double division of exact integers (< 2^53 for
docs under ~200k tokens at 1e-9 scaling — far past the chunking norms).

Scale (100 TB): four shuffles, all map-side combinable — (doc, token)
counts, the vocabulary-grain LM aggregation, the token-keyed
counts⋈LM join (co-partitioned with the LM shuffle; the vocabulary is
data-sized, so no broadcast assumption), and the per-doc rollup. The
global normalizer and outlier baseline are one-row broadcasts. Nothing
is ever collected; outlier thresholds are exact-integer
cross-multiplications against the corpus mean, so no floating
comparison drifts between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans import oracle_fragments as O
from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register
from qa_data_pipeline_rag_llm_spark.plans.queries_text import _quality_sql

#: doc-grain quality-score twin, shared with the correlation audit
_QUALITY_DOC_SQL = _quality_sql("doc_id")

#: ln() terms round to 1e-9-scaled longs before any sum (zipf discipline).
_LN9 = 1_000_000_000

#: hi/lo outlier bands: docs whose mean surprisal exceeds 5/4 of the
#: corpus mean (hi — out-of-distribution text) or falls under 3/4 of it
#: (lo — degenerate/templated). Compared by exact-integer
#: cross-multiplication, never by float ratio.
_HI_NUM, _HI_DEN = 5, 4
_LO_NUM, _LO_DEN = 3, 4

_TOPK_OUTLIERS = 20

# Shared CTE chain: token counts -> unigram LM -> per-doc surprisal.
# h6 = per-doc mean surprisal in micro-nats (BIGINT). The multiply-
# referenced CTEs are MATERIALIZED: DuckDB inlines plain CTEs once per
# reference, and doc6 + g6 both consume doch (the labelqual lesson).
_LM_SQL = f"""
    tok AS (SELECT doc_id, source, unnest({O.toks("text")}) AS w
            FROM documents WHERE doc_id IS NOT NULL),
    tokc AS MATERIALIZED (SELECT doc_id, source, w, CAST(COUNT(*) AS BIGINT) AS c
             FROM tok WHERE w != '' GROUP BY doc_id, source, w),
    lm AS MATERIALIZED (SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM tokc GROUP BY w),
    tot AS (SELECT CAST(SUM(CAST(cw AS DECIMAL(19,0))) AS DECIMAL(19,0))
                     AS n_total,
                   CAST(COUNT(*) AS DECIMAL(19,0)) AS v
            FROM lm),
    lml AS (SELECT w,
                   CAST(round(ln(CAST(2 * cw + 1 AS DOUBLE)) * {_LN9})
                        AS BIGINT) AS lp9
            FROM lm),
    zc AS (SELECT CAST(round(ln(CAST(2 * n_total + v AS DOUBLE)) * {_LN9})
                       AS BIGINT) AS z9
           FROM tot),
    doch AS MATERIALIZED (
      SELECT doc_id, source,
             CAST(SUM(CAST(c AS DECIMAL(19,0)) * (zc.z9 - lml.lp9))
                  AS DECIMAL(38,0)) AS s9,
             CAST(SUM(c) AS BIGINT) AS n_tok
      FROM tokc JOIN lml USING (w) CROSS JOIN zc
      GROUP BY doc_id, source),
    doc6 AS (
      SELECT doc_id, source, n_tok,
             CAST(round(CAST(s9 AS DOUBLE) / (n_tok * 1000.0)) AS BIGINT)
               AS h6
      FROM doch),
    g6 AS (
      SELECT CAST(round(CAST(SUM(CAST(s9 AS DECIMAL(38,0)))
                             AS DOUBLE)
                        / (CAST(SUM(CAST(n_tok AS DECIMAL(19,0)))
                                AS DOUBLE) * 1000.0)) AS BIGINT) AS g6
      FROM doch)
"""


def _lm_doc6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc6/g6 over the real documents table."""
    return _lm_doc6_from(_t(spark, sf_dir, "documents"))


def _lm_doc6_from(d: DataFrame):
    """(doc_id, source, n_tok, h6) per scored document plus the corpus
    baseline as a crossJoin-able one-row frame — the Spark twin of the
    doc6/g6 CTEs. Empty-token docs never enter (nothing to score).
    Separated from the table loader so property tests can feed synthetic
    corpora with hand-computed LM probabilities.

    The up-front ``doc_id IS NOT NULL`` filter (both twins carry it) is
    a PLAN-SHAPE requirement, not just a contract nicety: downstream
    doc-grain joins push an isnotnull(doc_id) into ONE of the three
    tokc consumers' subtrees, breaking canonical-subtree equality, and
    AQE's stage reuse then re-tokenizes the corpus once per consumer
    (three Generate+shuffle stages at sf10 — the r9 decade probe's LM
    cost head). With every branch filtered identically, the tokc and lm
    exchanges canonicalize equal and AQE materializes each ONCE
    (ReusedExchange; pinned by tests/test_plans.py)."""
    from qa_data_pipeline_rag_llm_spark.functions.text import tokens

    tok = d.filter(F.col("doc_id").isNotNull()).select(
        "doc_id", "source", F.explode(tokens("text")).alias("w")
    ).filter(F.col("w") != "")
    tokc = tok.groupBy("doc_id", "source", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    lm = tokc.groupBy("w").agg(F.sum("c").alias("cw"))
    tot = lm.agg(
        F.sum(F.col("cw").cast("decimal(19,0)"))
        .cast("decimal(19,0)")
        .alias("n_total"),
        F.count(F.lit(1)).cast("decimal(19,0)").alias("v"),
    )
    lml = lm.select(
        "w",
        F.round(F.log((2 * F.col("cw") + 1).cast("double")) * _LN9)
        .cast("long")
        .alias("lp9"),
    )
    zc = tot.select(
        F.round(
            F.log((2 * F.col("n_total") + F.col("v")).cast("double"))
            * _LN9
        )
        .cast("long")
        .alias("z9")
    )
    doch = (
        tokc.join(lml, "w")
        .crossJoin(F.broadcast(zc))
        .groupBy("doc_id", "source")
        .agg(
            F.sum(
                F.col("c").cast("decimal(19,0)")
                * (F.col("z9") - F.col("lp9"))
            )
            .cast("decimal(38,0)")
            .alias("s9"),
            F.sum("c").alias("n_tok"),
        )
    )
    doc6 = doch.select(
        "doc_id",
        "source",
        "n_tok",
        F.round(F.col("s9").cast("double") / (F.col("n_tok") * 1000.0))
        .cast("long")
        .alias("h6"),
    )
    g6 = doch.agg(
        F.round(
            F.sum(F.col("s9").cast("decimal(38,0)")).cast("double")
            / (
                F.sum(F.col("n_tok").cast("decimal(19,0)")).cast("double")
                * 1000.0
            )
        )
        .cast("long")
        .alias("g6")
    )
    return doc6, g6


@register(
    "lm_surprisal_by_source",
    f"""
    WITH {_LM_SQL}
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(CAST(SUM(CAST(h6 AS DECIMAL(19,0))) AS DOUBLE)
                 / (COUNT(*) * 1000000.0), 6) AS mean_nats,
           CAST(SUM(CASE WHEN h6 * {_HI_DEN} > g6.g6 * {_HI_NUM}
                         THEN 1 ELSE 0 END) AS BIGINT) AS hi_outliers,
           CAST(SUM(CASE WHEN h6 * {_LO_DEN} < g6.g6 * {_LO_NUM}
                         THEN 1 ELSE 0 END) AS BIGINT) AS lo_outliers
    FROM doc6 CROSS JOIN g6
    GROUP BY source
    """,
    doc="CCNet-style LM quality profile per source: mean unigram "
    "self-surprisal (nats/token) plus counts of hi/lo outlier docs — "
    "hi (> 5/4 of the corpus mean, exact-integer cross-multiplied) is "
    "out-of-distribution text a perplexity gate would drop, lo (< 3/4) "
    "is degenerate/templated repetition. The LM trains in-plan from "
    "the same corpus pass (add-half smoothing, ln terms pinned to "
    "1e-9-scaled longs before any aggregation). Four map-side-"
    "combinable shuffles; the corpus baseline is a one-row broadcast.",
)
def lm_surprisal_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc6, g6 = _lm_doc6(spark, sf_dir)
    hi = F.col("h6") * _HI_DEN > F.col("g6") * _HI_NUM
    lo = F.col("h6") * _LO_DEN < F.col("g6") * _LO_NUM
    return (
        doc6.crossJoin(F.broadcast(g6))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("h6").cast("decimal(19,0)")).cast("double")
                / (F.count(F.lit(1)) * 1_000_000.0),
                6,
            ).alias("mean_nats"),
            F.sum(hi.cast("long")).alias("hi_outliers"),
            F.sum(lo.cast("long")).alias("lo_outliers"),
        )
    )


@register(
    "lm_outlier_docs",
    f"""
    WITH {_LM_SQL}
    SELECT doc_id, source, n_tok,
           round(h6 / 1000000.0, 6) AS nats_per_token,
           rank
    FROM (SELECT doc_id, source, n_tok, h6,
                 CAST(ROW_NUMBER() OVER (ORDER BY h6 DESC, doc_id)
                      AS BIGINT) AS rank
          FROM doc6)
    WHERE rank <= {_TOPK_OUTLIERS}
    """,
    doc=f"The {_TOPK_OUTLIERS} most LM-surprising documents — the triage "
    "list a curator reads before trusting a perplexity gate's threshold "
    "(top of this list is what the gate would cut first). Total "
    "ordering (surprisal desc, doc_id) so the cut is reproducible; the "
    "global top-k runs as TakeOrdered over the per-doc frame — no "
    "corpus-sized single-partition window.",
)
def lm_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc6, _ = _lm_doc6(spark, sf_dir)
    # TakeOrdered prunes the corpus to k rows; the rank window then runs
    # on ≤ k rows (never a corpus-sized single partition)
    top = (
        doc6.orderBy(F.desc("h6"), F.asc("doc_id"))
        .limit(_TOPK_OUTLIERS)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("h6"), F.asc("doc_id"))
            ),
        )
    )
    return top.select(
        "doc_id",
        "source",
        "n_tok",
        F.round(F.col("h6") / 1_000_000.0, 6).alias("nats_per_token"),
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "lm_quality_correlation",
    f"""
    WITH {_LM_SQL},
    qv AS (SELECT doc_id, CAST(round(quality * 1000000) AS BIGINT) AS q6
           FROM ({_QUALITY_DOC_SQL})),
    pairs AS (SELECT d.h6 AS x, qv.q6 AS y
              FROM doc6 d JOIN qv USING (doc_id)),
    mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS DOUBLE) AS syy
      FROM pairs)
    SELECT CAST(n AS BIGINT) AS n_docs,
           round((n * sxy - sx * sy)
                 / nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0),
                 6) AS pearson_r
    FROM mom
    """,
    doc="Pearson correlation between per-doc LM surprisal and the "
    "engine's weighted quality score — the audit that says whether the "
    "cheap heuristic gate and the LM signal AGREE before a curator "
    "trusts either alone (strongly negative = high-surprisal docs score "
    "low quality, the expected direction; near zero = the two gates cut "
    "different corpora and both deserve review). Moment sums follow the "
    "zipf/cuped exact-decimal discipline over micro-scaled longs, so "
    "the correlation is a fixed double-op sequence both engines replay; "
    "NULL on zero variance. One extra doc-grain join over the LM chain.",
)
def lm_quality_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.functions.text import quality_score

    doc6, _ = _lm_doc6(spark, sf_dir)
    qv = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.round(quality_score("text") * 1_000_000)
        .cast("long")
        .alias("q6"),
    )
    pairs = doc6.join(qv, "doc_id").select(
        F.col("h6").alias("x"), F.col("q6").alias("y")
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d38("x")).cast("decimal(38,0)").cast("double").alias("sx"),
        F.sum(d38("y")).cast("decimal(38,0)").cast("double").alias("sy"),
        F.sum(d19("x") * d19("y"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("sxy"),
        F.sum(d19("x") * d19("x"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("sxx"),
        F.sum(d19("y") * d19("y"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return mom.select(
        F.col("n").cast("long").alias("n_docs"),
        F.round(
            num / F.when(den != 0, den).otherwise(F.lit(None)), 6
        ).alias("pearson_r"),
    )


# Pairwise KL needs only per-source scalars plus ONE token-keyed cross
# sum — never the dense |vocab| × |sources|² expansion:
#   KL(s‖t) = (A_s − 2·X_st − B_t) / (2·N_s + V) + ln Z_t − ln Z_s
# with A_s = Σ_{w∈s}(2c_sw+1)·L_s(w), B_t = Σ_{w∈t} L_t(w),
# X_st = Σ_{w∈s∩t} c_sw·L_t(w), L = ln(2c+1), Z = 2N+V. Tokens absent
# from both sources cancel exactly (L = ln 1 = 0), which is what makes
# the sparse form correct.
_KL_SQL = f"""
    tok AS (SELECT source, unnest({O.toks("text")}) AS w FROM documents),
    sc AS MATERIALIZED (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE w != '' GROUP BY source, w),
    ll AS MATERIALIZED (
      SELECT source, w, c,
             CAST(round(ln(CAST(2 * c + 1 AS DOUBLE)) * {_LN9}) AS BIGINT)
               AS l9
      FROM sc),
    ns AS MATERIALIZED (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM sc GROUP BY source),
    vv AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM sc),
    aa AS (SELECT source,
                  CAST(SUM(CAST(2 * c + 1 AS DECIMAL(19,0))
                           * CAST(l9 AS DECIMAL(19,0))) AS DECIMAL(38,0))
                    AS a9
           FROM ll GROUP BY source),
    bb AS (SELECT source,
                  CAST(SUM(CAST(l9 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS b9
           FROM ll GROUP BY source),
    xx AS (SELECT s.source AS src, l.source AS dst,
                  CAST(SUM(CAST(s.c AS DECIMAL(19,0))
                           * CAST(l.l9 AS DECIMAL(19,0))) AS DECIMAL(38,0))
                    AS x9
           FROM sc s JOIN ll l USING (w)
           WHERE s.source <> l.source
           GROUP BY s.source, l.source),
    zz AS (SELECT source, CAST(2 * n + vv.v AS BIGINT) AS den,
                  CAST(round(ln(CAST(2 * n + vv.v AS DOUBLE)) * {_LN9})
                       AS BIGINT) AS z9
           FROM ns CROSS JOIN vv),
    prs AS (SELECT a.source AS src, b.source AS dst
            FROM ns a CROSS JOIN ns b WHERE a.source <> b.source)
"""


@register(
    "source_kl_matrix",
    f"""
    WITH {_KL_SQL}
    SELECT prs.src AS source_a, prs.dst AS source_b,
           round(CAST(aa.a9 - 2 * coalesce(xx.x9, 0) - bb.b9 AS DOUBLE)
                   / (CAST(za.den AS DOUBLE) * {_LN9}.0)
                 + (zb.z9 - za.z9) / {_LN9}.0, 6) AS kl_nats
    FROM prs
    LEFT JOIN xx ON xx.src = prs.src AND xx.dst = prs.dst
    JOIN aa ON aa.source = prs.src
    JOIN bb ON bb.source = prs.dst
    JOIN zz za ON za.source = prs.src
    JOIN zz zb ON zb.source = prs.dst
    """,
    doc="Pairwise KL divergence between add-half-smoothed per-source "
    "unigram distributions — the mixture-redundancy audit: a source "
    "pair with near-zero KL both ways is distributionally one source "
    "(dedup/mixing weights should treat it so), and asymmetric KL "
    "locates subset relationships. Sparse exact formulation: two "
    "per-source scalar aggregates plus ONE token-keyed cross sum; "
    "tokens absent from both sources cancel exactly, so the dense "
    "vocab × pairs² expansion never materializes. ln terms pinned to "
    "1e-9-scaled longs; everything after the corpus pass is "
    "vocabulary- or |sources|²-sized.",
)
def source_kl_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(tokens("text")).alias("w")
    ).filter(F.col("w") != "")
    sc = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    ll = sc.select(
        "source",
        "w",
        "c",
        F.round(F.log((2 * F.col("c") + 1).cast("double")) * _LN9)
        .cast("long")
        .alias("l9"),
    )
    ns = sc.groupBy("source").agg(F.sum("c").alias("n"))
    vv = sc.agg(F.countDistinct("w").alias("v"))
    d19 = lambda col: col.cast("decimal(19,0)")  # noqa: E731
    aa = ll.groupBy("source").agg(
        F.sum(d19(2 * F.col("c") + 1) * d19(F.col("l9")))
        .cast("decimal(38,0)")
        .alias("a9")
    )
    bb = ll.groupBy("source").agg(
        F.sum(F.col("l9").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("b9")
    )
    xx = (
        sc.alias("s")
        .join(ll.alias("l"), "w")
        .where(F.col("s.source") != F.col("l.source"))
        .groupBy(
            F.col("s.source").alias("src"), F.col("l.source").alias("dst")
        )
        .agg(
            F.sum(d19(F.col("s.c")) * d19(F.col("l.l9")))
            .cast("decimal(38,0)")
            .alias("x9")
        )
    )
    zz = ns.crossJoin(F.broadcast(vv)).select(
        "source",
        (2 * F.col("n") + F.col("v")).cast("long").alias("den"),
        F.round(
            F.log((2 * F.col("n") + F.col("v")).cast("double")) * _LN9
        )
        .cast("long")
        .alias("z9"),
    )
    prs = (
        ns.select(F.col("source").alias("src"))
        .crossJoin(ns.select(F.col("source").alias("dst")))
        .where(F.col("src") != F.col("dst"))
    )
    kl = (
        F.col("a9").cast("double")
        - 2 * F.coalesce(F.col("x9"), F.lit(0)).cast("double")
        - F.col("b9").cast("double")
    ) / (F.col("den").cast("double") * float(_LN9)) + (
        F.col("z9_b") - F.col("z9_a")
    ) / float(_LN9)
    return (
        prs.join(xx, ["src", "dst"], "left")
        .join(aa.withColumnRenamed("source", "src"), "src")
        .join(bb.withColumnRenamed("source", "dst"), "dst")
        .join(
            zz.select(
                F.col("source").alias("src"),
                F.col("den"),
                F.col("z9").alias("z9_a"),
            ),
            "src",
        )
        .join(
            zz.select(
                F.col("source").alias("dst"), F.col("z9").alias("z9_b")
            ),
            "dst",
        )
        .select(
            F.col("src").alias("source_a"),
            F.col("dst").alias("source_b"),
            F.round(kl, 6).alias("kl_nats"),
        )
    )


# ---------------------------------------------------------------------------
# Reference-LM variant: the actual CCNet shape. The self-surprisal LM
# above trains on the whole corpus — including the outliers it is meant
# to find, which drags the baseline toward them. Here the LM trains
# ONLY on the clean slice (documents passing the Gopher hard rules) and
# scores EVERY document against it; tokens outside the reference
# vocabulary take the smoothing floor (2·0+1 numerator — the LEFT join's
# missing lp9 coalesces to ln(1) = 0) and are counted as OOV.

_REF_LM_SQL = f"""
    gk AS (SELECT doc_id, keep FROM ({{GOPHER}})),
    tok AS (SELECT doc_id, source, unnest({O.toks("text")}) AS w
            FROM documents WHERE doc_id IS NOT NULL),
    tokc AS MATERIALIZED (
      SELECT doc_id, source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE w != '' GROUP BY doc_id, source, w),
    lmr AS MATERIALIZED (
      SELECT w, CAST(SUM(c) AS BIGINT) AS cw
      FROM tokc JOIN gk USING (doc_id) WHERE gk.keep GROUP BY w),
    totr AS (SELECT CAST(coalesce(SUM(CAST(cw AS DECIMAL(19,0))), 0)
                         AS DECIMAL(19,0)) AS n_ref,
                    CAST(COUNT(*) AS DECIMAL(19,0)) AS v_ref
             FROM lmr),
    lmlr AS (SELECT w,
                    CAST(round(ln(CAST(2 * cw + 1 AS DOUBLE)) * {_LN9})
                         AS BIGINT) AS lp9
             FROM lmr),
    zcr AS (SELECT CASE WHEN v_ref = 0 THEN NULL
                 ELSE CAST(round(ln(CAST(2 * n_ref + v_ref AS DOUBLE))
                           * {_LN9}) AS BIGINT) END AS z9
            FROM totr),
    dochr AS MATERIALIZED (
      SELECT doc_id, source,
             CAST(SUM(CAST(c AS DECIMAL(19,0))
                      * (zcr.z9 - coalesce(lmlr.lp9, 0)))
                  AS DECIMAL(38,0)) AS s9,
             CAST(SUM(c) AS BIGINT) AS n_tok,
             CAST(SUM(CASE WHEN lmlr.w IS NULL THEN c ELSE 0 END)
                  AS BIGINT) AS n_oov
      FROM tokc LEFT JOIN lmlr USING (w) CROSS JOIN zcr
      GROUP BY doc_id, source)
"""


def _ref_lm_oracle() -> str:
    from qa_data_pipeline_rag_llm_spark.plans.queries_labelqual import (
        _gopher_keep_sql,
    )

    return f"""
    WITH {_REF_LM_SQL.format(GOPHER=_gopher_keep_sql())}
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(CAST(SUM(CAST(CAST(round(CAST(s9 AS DOUBLE)
                                          / (n_tok * 1000.0)) AS BIGINT)
                               AS DECIMAL(19,0))) AS DOUBLE)
                 / (COUNT(*) * 1000000.0), 6) AS mean_nats,
           round(CAST(SUM(CAST(n_oov AS DECIMAL(19,0))) AS DOUBLE)
                 / CAST(SUM(CAST(n_tok AS DECIMAL(19,0))) AS DOUBLE),
                 6) AS oov_rate
    FROM dochr
    GROUP BY source
    """


@register(
    "lm_ref_surprisal_by_source",
    _ref_lm_oracle(),
    doc="The actual CCNet recipe: the unigram LM trains ONLY on the "
    "clean slice (Gopher-pass documents — the in-repo stand-in for "
    "CCNet's Wikipedia LM) and every document scores against it, so "
    "outliers can't drag the baseline toward themselves the way the "
    "self-surprisal variant allows. Out-of-reference-vocabulary tokens "
    "take the smoothing floor via a LEFT join (missing lp9 = ln 1 = 0) "
    "and surface as per-source oov_rate — itself a quality signal "
    "(high OOV against the clean slice = vocabulary drift). Same "
    "exact-integer log discipline and shuffle shape as the self-LM; "
    "one extra semi-join against the Gopher verdict.",
)
def lm_ref_surprisal_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.functions.text import tokens
    from qa_data_pipeline_rag_llm_spark.plans.queries_curation import (
        gopher_verdict,
    )

    d = _t(spark, sf_dir, "documents")
    gk = gopher_verdict(d.select("doc_id", "text")).select("doc_id", "keep")
    # same canonical-subtree alignment as _lm_doc6_from: every tokc
    # consumer must see the identical isnotnull(doc_id)-filtered scan
    # or AQE re-tokenizes per consumer
    tok = d.filter(F.col("doc_id").isNotNull()).select(
        "doc_id", "source", F.explode(tokens("text")).alias("w")
    ).filter(F.col("w") != "")
    tokc = tok.groupBy("doc_id", "source", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    lmr = (
        tokc.join(gk.where(F.col("keep")).select("doc_id"), "doc_id")
        .groupBy("w")
        .agg(F.sum("c").alias("cw"))
    )
    totr = lmr.agg(
        F.coalesce(
            F.sum(F.col("cw").cast("decimal(19,0)")).cast("decimal(19,0)"),
            F.lit(0).cast("decimal(19,0)"),
        ).alias("n_ref"),
        F.count(F.lit(1)).cast("decimal(19,0)").alias("v_ref"),
    )
    lmlr = lmr.select(
        "w",
        F.round(F.log((2 * F.col("cw") + 1).cast("double")) * _LN9)
        .cast("long")
        .alias("lp9"),
    )
    # degenerate corpus guard (advice r09): an empty clean slice means
    # v_ref = 0 and ln(0) — DuckDB's -inf→BIGINT cast errors while
    # Spark's log(0) yields NULL. Both twins pin z9 NULL instead, which
    # flows to NULL mean_nats with oov_rate = 1 (every token is OOV
    # against an empty reference vocabulary) — same rows either engine.
    zcr = totr.select(
        F.when(F.col("v_ref") == 0, F.lit(None).cast("long"))
        .otherwise(
            F.round(
                F.log((2 * F.col("n_ref") + F.col("v_ref")).cast("double"))
                * _LN9
            ).cast("long")
        )
        .alias("z9")
    )
    dochr = (
        tokc.join(lmlr, "w", "left")
        .crossJoin(F.broadcast(zcr))
        .groupBy("doc_id", "source")
        .agg(
            F.sum(
                F.col("c").cast("decimal(19,0)")
                * (F.col("z9") - F.coalesce(F.col("lp9"), F.lit(0)))
            )
            .cast("decimal(38,0)")
            .alias("s9"),
            F.sum("c").alias("n_tok"),
            F.sum(
                F.when(F.col("lp9").isNull(), F.col("c")).otherwise(
                    F.lit(0)
                )
            ).alias("n_oov"),
        )
    )
    h6 = F.round(
        F.col("s9").cast("double") / (F.col("n_tok") * 1000.0)
    ).cast("long")
    return (
        dochr.select("source", h6.alias("h6"), "n_tok", "n_oov")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("h6").cast("decimal(19,0)")).cast("double")
                / (F.count(F.lit(1)) * 1_000_000.0),
                6,
            ).alias("mean_nats"),
            F.round(
                F.sum(F.col("n_oov").cast("decimal(19,0)")).cast("double")
                / F.sum(F.col("n_tok").cast("decimal(19,0)")).cast(
                    "double"
                ),
                6,
            ).alias("oov_rate"),
        )
    )
