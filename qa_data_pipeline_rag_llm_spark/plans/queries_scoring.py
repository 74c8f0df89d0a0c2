"""Registry entries: score/label analytics — classifier-eval primitives.

The reference has no model-quality layer at all (SURVEY.md §2.5 — its
only "eval" is eyeballing the RAG answer in app2.py), but a pipeline
that gates 100 TB of training data on model scores (quality
classifiers, toxicity scores, reward models) needs the standard
readouts computed EXACTLY and distributed:

  * ``auc_score_events`` — exact ROC-AUC via the tie-aware rank-sum
    (Mann-Whitney U) identity. No per-row global sort: scores are
    pre-aggregated per distinct value and the cumulative-below counts
    come from the bucket-offset ``rank_cumsum`` operator, so the only
    data-sized stage is one score-key shuffle. All moments are exact
    scaled integers (decimal sums); AUC is one final division.
  * ``brier_ece_events`` — Brier score + 10-bin expected calibration
    error with EXACT integer numerators: predicted probability is the
    min-max rational (v - min)/(max - min) carried as (numerator,
    shared denominator) so (p - y)^2 and every per-bin gap are integer
    arithmetic until a single closing division.
  * ``calibration_bins_events`` — the per-bin reliability table behind
    that ECE (n, mean predicted p, empirical rate, gap per decile bin).
  * ``chi2_tokens_by_source`` — per-source top-10 tokens by chi-squared
    association (2x2 contingency vs the rest of the corpus) — the
    classic distinctive-vocabulary / contamination probe. Counts are
    exact integers; the statistic is a fixed double-op sequence both
    engines replay identically (the zipf_slope discipline), and the
    per-source top-k runs through salted_top_k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans import oracle_fragments as O
from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register

#: events.value has 2 fractional digits — scale-100 longs are exact.
V_SCALE = 100

#: the positive class for the score/label readouts.
POS_TYPE = "purchase"

#: calibration resolution: 10 equal-width probability bins.
N_BINS = 10

#: per-source distinctive-token report depth.
CHI2_K = 10

_Y = f"CASE WHEN event_type = '{POS_TYPE}' THEN 1 ELSE 0 END"


@register(
    "auc_score_events",
    f"""
    WITH lab AS (
      SELECT CAST(round(value * {V_SCALE}) AS BIGINT) AS s, {_Y} AS y
      FROM events),
    g AS (
      SELECT s, CAST(SUM(y) AS BIGINT) AS np,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS t
      FROM lab GROUP BY s),
    c AS (
      SELECT s, np, nn, t,
             CAST(SUM(t) OVER (ORDER BY s) AS BIGINT) AS cum
      FROM g),
    agg AS (
      SELECT
        CAST(CAST(SUM(CAST(np AS DECIMAL(38,0))) AS DECIMAL(38,0))
             AS BIGINT) AS n_pos,
        CAST(CAST(SUM(CAST(nn AS DECIMAL(38,0))) AS DECIMAL(38,0))
             AS BIGINT) AS n_neg,
        CAST(CAST(SUM(CAST(np AS DECIMAL(38,0))
                      * CAST(2 * (cum - t) + t + 1 AS DECIMAL(38,0)))
             AS DECIMAL(38,0)) AS DOUBLE) AS rs2
      FROM c)
    SELECT n_pos, n_neg,
           round((rs2 - CAST(n_pos AS DOUBLE) * (n_pos + 1))
                 / nullif(2.0 * n_pos * n_neg, 0), 6) AS auc
    FROM agg
    """,
    doc="Exact tie-aware ROC-AUC of the event score against the "
    f"'{POS_TYPE}' label via the Mann-Whitney rank-sum identity: "
    "AUC = (2*sum of positive avg-ranks - nP(nP+1)) / (2 nP nN). "
    "Scores collapse to one row per distinct value first (one "
    "partial-agg shuffle absorbs the corpus), so ranks are over the "
    "DISTINCT-score frame — cumulative counts come from the "
    "bucket-offset rank_cumsum operator, never a single-task global "
    "window, and tie groups contribute their average rank in closed "
    "form (2*below + t + 1, kept doubled to stay integer). Moment "
    "sums are exact decimals; AUC is one closing division (nullif "
    "guards a single-class input). At 100 TB: one score-key shuffle "
    "plus a distinct-score-sized ranking pass.",
)
def auc_score_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.operators.cumulative import (
        rank_cumsum,
    )

    ev = _t(spark, sf_dir, "events")
    lab = ev.select(
        F.round(F.col("value") * V_SCALE).cast("long").alias("s"),
        F.when(F.col("event_type") == POS_TYPE, 1).otherwise(0).alias("y"),
    )
    g = lab.groupBy("s").agg(
        F.sum("y").cast("long").alias("np"),
        (F.count("*") - F.sum("y")).cast("long").alias("nn"),
        F.count("*").cast("long").alias("t"),
    )
    c = rank_cumsum(
        g, [F.asc("s")], "t", cumsum_col="cum", bucket_col="s"
    ).withColumn("cum", F.col("cum").cast("long"))
    dec = lambda c_: c_.cast("decimal(38,0)")  # noqa: E731
    ranks2 = 2 * (F.col("cum") - F.col("t")) + F.col("t") + 1
    agg = c.agg(
        F.sum(dec(F.col("np"))).cast("long").alias("n_pos"),
        F.sum(dec(F.col("nn"))).cast("long").alias("n_neg"),
        F.sum(dec(F.col("np")) * dec(ranks2))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("rs2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            (
                F.col("rs2")
                - F.col("n_pos").cast("double") * (F.col("n_pos") + 1)
            )
            / F.expr("nullif(2.0 * n_pos * n_neg, 0)"),
            6,
        ).alias("auc"),
    )


# Shared CTE text: the per-event exact probability numerator against
# the global min-max denominator collapses IMMEDIATELY to (num, y, bin)
# cells with a count — the calibration metrics are all linear/quadratic
# in (num, y), so the cell frame (bounded by the score domain, not the
# row count) carries everything. Both oracles replay it so the bin
# edges and the cell algebra are pinned in one place.
_PCELLS = f"""
    lab AS (
      SELECT CAST(round(value * {V_SCALE}) AS BIGINT) AS v, {_Y} AS y
      FROM events),
    mm AS (
      SELECT CAST(MIN(v) AS BIGINT) AS lo,
             CAST(MAX(v) - MIN(v) AS BIGINT) AS d
      FROM lab),
    cells AS (
      SELECT v - lo AS num, d, y,
             CAST(LEAST({N_BINS - 1}, ({N_BINS} * (v - lo)) // d)
                  AS INTEGER) AS bin,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lab, mm
      GROUP BY v - lo, d, y,
               CAST(LEAST({N_BINS - 1}, ({N_BINS} * (v - lo)) // d)
                    AS INTEGER))
"""


@register(
    "brier_ece_events",
    f"""
    WITH {_PCELLS},
    bins AS (
      SELECT bin, d, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CAST(c AS DECIMAL(38,0))
                      * CAST(num AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS snum,
             CAST(SUM(c * y) AS BIGINT) AS npos
      FROM cells GROUP BY bin, d),
    sq AS (
      SELECT d, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CAST(c AS DECIMAL(38,0))
                      * CAST((num - y * d) * (num - y * d)
                             AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS serr
      FROM cells GROUP BY d)
    SELECT CAST(sq.n AS BIGINT) AS n,
           round(CAST(sq.serr AS DOUBLE)
                 / (CAST(sq.n AS DOUBLE) * CAST(sq.d AS DOUBLE)
                    * CAST(sq.d AS DOUBLE)), 6) AS brier,
           round(CAST((SELECT CAST(SUM(abs(CAST(npos AS DECIMAL(38,0))
                                           * d - snum))
                               AS DECIMAL(38,0)) FROM bins) AS DOUBLE)
                 / (CAST(sq.n AS DOUBLE) * CAST(sq.d AS DOUBLE)), 6)
             AS ece
    FROM sq
    """,
    doc="Brier score + 10-bin expected calibration error of the "
    f"min-max-scaled event score against the '{POS_TYPE}' label, with "
    "EXACT integer numerators end-to-end: p = (v-min)/(max-min) is "
    "carried as the integer numerator against the shared global "
    "denominator, so each (p-y)^2 term is c·(num - y·d)^2 and each "
    "bin's |rate - mean_p| gap is |npos·d - Σc·num| / (n_b·d) — "
    "decimal-summed integers, one closing division per metric (the "
    "cuped/zipf discipline; no float summation anywhere). ONE fact "
    "scan: the labeled scan collapses to (num, y) cells immediately "
    "(both metrics are low-degree polynomials in num and y, so the "
    "domain-bounded cell frame carries them), the min-max 1-row frame "
    "re-aggregates the same scan (exchange-reuse, q11 pattern), and "
    "the per-bin and per-corpus reductions both fold the SAME cell "
    "exchange. At 100 TB: one scan, one cell-key partial-agg shuffle, "
    "bounded reductions after.",
)
def brier_ece_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _prob_cells(spark, sf_dir)
    dec = lambda c_: c_.cast("decimal(38,0)")  # noqa: E731
    bins = cells.groupBy("bin", "d").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(dec(F.col("c")) * dec(F.col("num")))
        .cast("decimal(38,0)")
        .alias("snum"),
        F.sum(F.col("c") * F.col("y")).cast("long").alias("npos"),
    )
    err = F.col("num") - F.col("y") * F.col("d")
    sq = cells.groupBy("d").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(dec(F.col("c")) * dec(err * err))
        .cast("decimal(38,0)")
        .alias("serr"),
    )
    gaps = bins.agg(
        F.sum(F.abs(dec(F.col("npos")) * F.col("d") - F.col("snum")))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("sgap")
    )
    return sq.crossJoin(F.broadcast(gaps)).select(
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("serr").cast("double")
            / (
                F.col("n").cast("double")
                * F.col("d").cast("double")
                * F.col("d").cast("double")
            ),
            6,
        ).alias("brier"),
        F.round(
            F.col("sgap")
            / (F.col("n").cast("double") * F.col("d").cast("double")),
            6,
        ).alias("ece"),
    )


@register(
    "calibration_bins_events",
    f"""
    WITH {_PCELLS}
    SELECT bin, CAST(SUM(c) AS BIGINT) AS n,
           round(CAST(CAST(SUM(CAST(c AS DECIMAL(38,0))
                           * CAST(num AS DECIMAL(38,0)))
                      AS DECIMAL(38,0)) AS DOUBLE)
                 / (SUM(c) * CAST(d AS DOUBLE)), 6) AS mean_p,
           round(CAST(SUM(c * y) AS DOUBLE) / SUM(c), 6) AS pos_rate,
           round(CAST(SUM(c * y) AS DOUBLE) / SUM(c)
                 - CAST(CAST(SUM(CAST(c AS DECIMAL(38,0))
                             * CAST(num AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS DOUBLE)
                   / (SUM(c) * CAST(d AS DOUBLE)), 6) AS gap
    FROM cells GROUP BY bin, d
    """,
    doc="Reliability table behind brier_ece_events: per decile bin of "
    "the min-max-scaled score, the row count, exact mean predicted "
    "probability (decimal-summed integer numerators over the shared "
    "denominator), empirical positive rate, and their gap — the table "
    "a score-recalibration (Platt/isotonic) fits from. Same cell-"
    "collapse discipline and the same single cell-key shuffle as the "
    "one-row summary; 10 output rows regardless of scale.",
)
def calibration_bins_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _prob_cells(spark, sf_dir)
    dec = lambda c_: c_.cast("decimal(38,0)")  # noqa: E731
    return (
        cells.groupBy("bin", "d")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(dec(F.col("c")) * dec(F.col("num")))
            .cast("decimal(38,0)")
            .cast("double")
            .alias("snum"),
            F.sum(F.col("c") * F.col("y")).cast("long").alias("npos"),
        )
        .select(
            "bin",
            "n",
            F.round(
                F.col("snum") / (F.col("n") * F.col("d").cast("double")), 6
            ).alias("mean_p"),
            F.round(F.col("npos") / F.col("n").cast("double"), 6).alias(
                "pos_rate"
            ),
            F.round(
                F.col("npos") / F.col("n").cast("double")
                - F.col("snum") / (F.col("n") * F.col("d").cast("double")),
                6,
            ).alias("gap"),
        )
    )


def _prob_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(num, d, y, bin, c) cell frame shared by the calibration queries.

    One fact scan: the min-max 1-row frame re-aggregates the same scan
    and broadcasts back (exchange reuse dedupes the subtree — the
    q11/q15 pattern, queries_olap2.py), and the immediate groupBy
    collapses the corpus to score-domain-bounded cells, so every
    downstream reduction works on a tiny frame. err bound: |num - y·d|
    <= d, so the per-cell (num - y·d)^2 stays in int64 for score
    domains up to ~3e9 distinct cents."""
    ev = _t(spark, sf_dir, "events")
    lab = ev.select(
        F.round(F.col("value") * V_SCALE).cast("long").alias("v"),
        F.when(F.col("event_type") == POS_TYPE, 1).otherwise(0).alias("y"),
    )
    mm = lab.agg(
        F.min("v").cast("long").alias("lo"),
        (F.max("v") - F.min("v")).cast("long").alias("d"),
    )
    return (
        lab.crossJoin(F.broadcast(mm))
        .groupBy(
            (F.col("v") - F.col("lo")).alias("num"),
            "d",
            "y",
            F.least(
                F.lit(N_BINS - 1),
                F.expr(f"({N_BINS} * (v - lo)) div d"),
            )
            .cast("int")
            .alias("bin"),
        )
        .agg(F.count("*").cast("long").alias("c"))
    )


@register(
    "chi2_tokens_by_source",
    f"""
    WITH tok AS (SELECT source, unnest({O.toks("text")}) AS w
                 FROM documents),
    tc AS (SELECT source, w, COUNT(*) AS a FROM tok WHERE w != ''
           GROUP BY source, w),
    tw AS (SELECT w, CAST(SUM(a) AS BIGINT) AS tot_w FROM tc GROUP BY w),
    ts AS (SELECT source, CAST(SUM(a) AS BIGINT) AS tot_s
           FROM tc GROUP BY source),
    tn AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM tc),
    cell AS (
      SELECT tc.source, tc.w, tc.a,
             tw.tot_w - tc.a AS b, ts.tot_s - tc.a AS c,
             tn.n - tw.tot_w - ts.tot_s + tc.a AS d, tn.n AS n
      FROM tc JOIN tw USING (w) JOIN ts USING (source), tn),
    scored AS (
      SELECT source, w AS token, CAST(a AS BIGINT) AS tf,
             round(CAST(n AS DOUBLE)
                   * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
                   * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
                   / nullif(CAST(a + b AS DOUBLE) * (c + d)
                            * (a + c) * (b + d), 0), 6) AS chi2
      FROM cell)
    SELECT source, token, tf, chi2, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER
            (PARTITION BY source ORDER BY chi2 DESC, token) AS rank
          FROM scored)
    WHERE rank <= {CHI2_K}
    """,
    doc=f"Per-source top-{CHI2_K} tokens by chi-squared association "
    "against the rest of the corpus (2x2 contingency per (source, "
    "token): in-source vs elsewhere, this-token vs all others) — the "
    "distinctive-vocabulary probe that surfaces boilerplate, "
    "contamination, and domain drift per source. All four cell counts "
    "are exact integers from partial-agg shuffles (token-key and "
    "source-key); the statistic itself is a fixed double-op sequence "
    "both engines replay identically on those integers (the "
    "zipf_slope discipline — no float accumulation), with nullif "
    "guarding degenerate margins. Source totals and the grand total "
    "broadcast (sources are few; both re-aggregate the (source, "
    "token) frame, so the exchange dedupes); the per-source top-k "
    "runs through salted_top_k, never one task per source over the "
    "vocabulary. Ranked on the ROUNDED statistic so the order the "
    "report shows is the order both engines agree on.",
)
def chi2_tokens_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.functions.text import tokens
    from qa_data_pipeline_rag_llm_spark.operators.ranking import (
        salted_top_k,
    )

    d_ = _t(spark, sf_dir, "documents")
    tok = d_.select(
        "source", F.explode(tokens("text")).alias("w")
    ).filter(F.col("w") != "")
    tc = tok.groupBy("source", "w").agg(F.count("*").alias("a"))
    tw = tc.groupBy("w").agg(F.sum("a").cast("long").alias("tot_w"))
    ts = tc.groupBy("source").agg(F.sum("a").cast("long").alias("tot_s"))
    tn = tc.agg(F.sum("a").cast("long").alias("n"))
    cell = (
        tc.join(tw, "w")
        .join(F.broadcast(ts), "source")
        .crossJoin(F.broadcast(tn))
        .select(
            "source",
            F.col("w").alias("token"),
            F.col("a").cast("long").alias("tf"),
            (F.col("tot_w") - F.col("a")).alias("b"),
            (F.col("tot_s") - F.col("a")).alias("c"),
            (F.col("n") - F.col("tot_w") - F.col("tot_s") + F.col("a"))
            .alias("d"),
            "n",
        )
    )
    ad_bc = F.col("tf").cast("double") * F.col("d") - F.col(
        "b"
    ).cast("double") * F.col("c")
    scored = cell.select(
        "source",
        "token",
        "tf",
        F.round(
            F.col("n").cast("double")
            * ad_bc
            * ad_bc
            / F.expr(
                "nullif(CAST(tf + b AS DOUBLE) * (c + d) * (tf + c)"
                " * (b + d), 0)"
            ),
            6,
        ).alias("chi2"),
    )
    return salted_top_k(
        scored,
        ["source"],
        [F.desc("chi2"), F.asc("token")],
        CHI2_K,
        salt_col="token",
    ).select(
        "source",
        "token",
        "tf",
        "chi2",
        F.col("rank").cast("int").alias("rank"),
    )
