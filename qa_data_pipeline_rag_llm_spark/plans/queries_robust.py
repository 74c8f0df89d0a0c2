"""Registry entries: robust statistics / physical-planning primitives.

Absent from the reference (no stats layer — SURVEY.md §2.5), but core
to operating a 100 TB pipeline:

  * ``cusum_changepoint_events`` — per-event-type CUSUM mean-shift
    detection over the daily series: the day where the cumulative
    deviation from the series mean peaks. Deviations are kept as
    n·prefix − k·total (cross-multiplied integers, no mean division),
    so the argmax is exact; the per-type window frame is the day
    series (bounded by the calendar, not the data).
  * ``trimmed_mean_events`` — exact 5%-trimmed mean per event type
    via the distinct-value cumulative frame: per kept-rank-range
    contribution = clamp(cum, k, n-k) overlap × value, all integer
    until the closing division. No sort of raw rows — the corpus
    collapses to (type, value-cent) counts first.
  * ``equidepth_bounds_events`` — the exact 16-quantile boundary
    table of the value column (the input a range partitioner / sort
    writer consumes). Each distinct value emits precisely the
    boundary indices it covers via an integer-inequality sequence —
    ceil(j·n/B) ∈ (cum_prev, cum] ⟺ j ∈ (cum_prev·B/n, cum·B/n] —
    so after the cumulative pass the reduction is 15 rows, no
    per-quantile scans.

All three share the discipline of the scoring family: one value-key
partial-agg shuffle absorbs the corpus; everything after runs on
frames bounded by the value domain or the calendar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register

#: events.value has 2 fractional digits — scale-100 longs are exact.
V_SCALE = 100

#: trimmed-mean cut: n div TRIM_DEN rows dropped from EACH tail.
TRIM_DEN = 20

#: equi-depth resolution: B buckets -> B-1 interior boundaries.
N_BUCKETS = 16

_DAY_US = 86_400_000_000


@register(
    "cusum_changepoint_events",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // {_DAY_US} AS BIGINT) AS day,
             CAST(SUM(CAST(round(value * {V_SCALE}) AS BIGINT)) AS BIGINT)
               AS x
      FROM events GROUP BY event_type, epoch_us(ts) // {_DAY_US}),
    ser AS (
      SELECT event_type, day, x,
             CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS pre,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY day) AS BIGINT) AS k,
             CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT)
               AS tot,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n
      FROM daily),
    dev AS (
      SELECT event_type, day, n,
             abs(n * pre - k * tot) AS s_abs
      FROM ser)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(day AS BIGINT) AS cp_day,
           round(CAST(s_abs AS DOUBLE)
                 / (CAST(n AS DOUBLE) * {V_SCALE}), 4) AS cusum_max
    FROM (SELECT *, ROW_NUMBER() OVER
            (PARTITION BY event_type
             ORDER BY s_abs DESC, day) AS rn
          FROM dev)
    WHERE rn = 1
    """,
    doc="CUSUM mean-shift changepoint per event type over the daily "
    "value series: the day maximizing |cumulative deviation from the "
    "series mean|. The deviation is carried as n·prefix(k) − k·total "
    "— cross-multiplied exact integers, so the argmax needs no mean "
    "division and both engines agree exactly (ties break to the "
    "earliest day); the reported magnitude unscales once at the end. "
    "The corpus-sized work is the (type, day) partial-agg shuffle; "
    "every window after runs per type over the DAY series — a frame "
    "bounded by the calendar (~90 rows here, 3650 for a decade), "
    "never by the event count.",
)
def cusum_changepoint_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr(f"CAST(unix_micros(ts) div {_DAY_US} AS BIGINT)").alias(
            "day"
        ),
    ).agg(
        F.sum(F.round(F.col("value") * V_SCALE).cast("long"))
        .cast("long")
        .alias("x")
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_all = Window.partitionBy("event_type")
    ser = daily.select(
        "event_type",
        "day",
        F.sum("x").over(w_ord).cast("long").alias("pre"),
        F.row_number().over(w_ord).cast("long").alias("k"),
        F.sum("x").over(w_all).cast("long").alias("tot"),
        F.count("*").over(w_all).cast("long").alias("n"),
    )
    dev = ser.select(
        "event_type",
        "day",
        "n",
        F.abs(F.col("n") * F.col("pre") - F.col("k") * F.col("tot")).alias(
            "s_abs"
        ),
    )
    w_top = Window.partitionBy("event_type").orderBy(
        F.desc("s_abs"), F.asc("day")
    )
    return (
        dev.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("day").alias("cp_day"),
            F.round(
                F.col("s_abs").cast("double")
                / (F.col("n").cast("double") * V_SCALE),
                4,
            ).alias("cusum_max"),
        )
    )


@register(
    "trimmed_mean_events",
    f"""
    WITH vc AS (
      SELECT event_type, CAST(round(value * {V_SCALE}) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, CAST(round(value * {V_SCALE})
                                            AS BIGINT)),
    cum AS (
      SELECT event_type, v, c,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v)
                  AS BIGINT) AS cum,
             CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM vc),
    kept AS (
      SELECT event_type, n, n // {TRIM_DEN} AS k,
             GREATEST(CAST(0 AS BIGINT),
                      LEAST(cum, n - n // {TRIM_DEN})
                      - GREATEST(cum - c, n // {TRIM_DEN})) AS kc,
             v
      FROM cum)
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(k) AS BIGINT) AS n_trimmed_each,
           round(CAST(CAST(SUM(CAST(kc AS DECIMAL(38,0)) * v)
                      AS DECIMAL(38,0)) AS DOUBLE)
                 / ((MAX(n) - 2 * MAX(k)) * CAST({V_SCALE} AS DOUBLE)),
                 6) AS trimmed_mean
    FROM kept GROUP BY event_type
    """,
    doc="Exact 5%-trimmed mean of the event value per type (the "
    "robust location estimate a monitoring threshold should use "
    "instead of the outlier-dragged mean). No raw-row sort: the "
    "corpus collapses to per-(type, cent-value) counts, a per-type "
    "cumulative over the DISTINCT-value frame (bounded by the cent "
    "domain, not the row count) assigns each value its rank span, "
    "and the kept mass is the integer overlap of [cum-c, cum) with "
    "[k, n-k) — clamp arithmetic, decimal-summed, one closing "
    "division. Tied boundary values contribute exactly their "
    "in-range multiplicity, matching what a true sorted trim would "
    "keep. One value-key shuffle at any scale.",
)
def trimmed_mean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    vc = ev.groupBy(
        "event_type",
        F.round(F.col("value") * V_SCALE).cast("long").alias("v"),
    ).agg(F.count("*").cast("long").alias("c"))
    w_ord = Window.partitionBy("event_type").orderBy("v")
    w_all = Window.partitionBy("event_type")
    cum = vc.select(
        "event_type",
        "v",
        "c",
        F.sum("c").over(w_ord).cast("long").alias("cum"),
        F.sum("c").over(w_all).cast("long").alias("n"),
    )
    k = F.expr(f"n div {TRIM_DEN}")
    kc = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), F.col("n") - k)
        - F.greatest(F.col("cum") - F.col("c"), k),
    )
    kept = cum.select(
        "event_type", "n", k.alias("k"), kc.alias("kc"), "v"
    )
    return kept.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("k").cast("long").alias("n_trimmed_each"),
        F.round(
            F.sum(F.col("kc").cast("decimal(38,0)") * F.col("v"))
            .cast("decimal(38,0)")
            .cast("double")
            / (
                (F.max("n") - 2 * F.max("k"))
                * F.lit(float(V_SCALE))
            ),
            6,
        ).alias("trimmed_mean"),
    )


@register(
    "equidepth_bounds_events",
    f"""
    WITH vc AS (
      SELECT CAST(round(value * {V_SCALE}) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY CAST(round(value * {V_SCALE}) AS BIGINT)),
    cum AS (
      SELECT v, c,
             CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum,
             CAST(SUM(c) OVER () AS BIGINT) AS n
      FROM vc),
    hits AS (
      SELECT unnest(generate_series(
               ((cum - c) * {N_BUCKETS}) // n + 1,
               (cum * {N_BUCKETS}) // n)) AS j,
             v, n
      FROM cum
      WHERE (cum * {N_BUCKETS}) // n > ((cum - c) * {N_BUCKETS}) // n)
    SELECT CAST(j AS INTEGER) AS bucket,
           CAST(CAST(j AS BIGINT) * n // {N_BUCKETS} + CASE
                WHEN (CAST(j AS BIGINT) * n) % {N_BUCKETS} = 0
                THEN 0 ELSE 1 END AS BIGINT) AS target_rank,
           round(CAST(v AS DOUBLE) / {V_SCALE}, 2) AS boundary
    FROM hits WHERE j BETWEEN 1 AND {N_BUCKETS - 1}
    """,
    doc=f"Exact {N_BUCKETS}-quantile (equi-depth) boundary table of "
    "the event value — the table a range partitioner, sort-based "
    "writer, or histogram-equalized z-order key consumes. Boundary j "
    "is the value at rank ceil(j·n/B); each distinct value emits "
    "exactly the j's it covers via the integer inequality "
    "ceil(j·n/B) ∈ (cum−c, cum] ⟺ j ∈ ((cum−c)·B/n, cum·B/n] — a "
    "sequence() explode of at most B−1 rows TOTAL across the corpus, "
    "so after the distinct-value cumulative pass the reduction is "
    "free. One value-key shuffle; the cumulative runs over the "
    "cent-domain-bounded distinct frame. Cross-multiplied integers "
    "throughout (the AUC discipline); the only division is the "
    "display unscale.",
)
def equidepth_bounds_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.operators.cumulative import (
        rank_cumsum,
    )

    ev = _t(spark, sf_dir, "events")
    vc = ev.groupBy(
        F.round(F.col("value") * V_SCALE).cast("long").alias("v")
    ).agg(F.count("*").cast("long").alias("c"))
    # cumulative over the distinct-value frame via the bucket-offset
    # operator (the auc_score_events pattern — no single-task global
    # window even on this reduced frame); the 1-row total broadcasts
    tot = vc.agg(F.sum("c").cast("long").alias("n"))
    cum = (
        rank_cumsum(vc, [F.asc("v")], "c", cumsum_col="cum", bucket_col="v")
        .withColumn("cum", F.col("cum").cast("long"))
        .crossJoin(F.broadcast(tot))
    )
    jlo = F.expr(f"((cum - c) * {N_BUCKETS}) div n") + 1
    jhi = F.expr(f"(cum * {N_BUCKETS}) div n")
    hits = (
        cum.filter(jhi >= jlo)
        .select(
            F.explode(F.sequence(jlo, jhi)).alias("j"), "v", "n"
        )
        .filter(F.col("j").between(1, N_BUCKETS - 1))
    )
    target = F.expr(
        f"CAST(j * n div {N_BUCKETS} + CASE WHEN (j * n) % {N_BUCKETS}"
        f" = 0 THEN 0 ELSE 1 END AS BIGINT)"
    )
    return hits.select(
        F.col("j").cast("int").alias("bucket"),
        target.alias("target_rank"),
        F.round(F.col("v").cast("double") / V_SCALE, 2).alias("boundary"),
    )


# ---------------------------------------------------------------------------
# Mergeable fixed-bin quantile sketch: completes the mergeable-summary
# family (HLL=distinct, CMS=frequency, Bloom=membership, MG=heavy hitters,
# A-ExpJ=sampling — and now quantiles). Two passes: a 1-row bounds agg
# fixes the bin domain, then the histogram state is HIST_BINS longs whose
# per-partition partials merge by plain addition — the KLL/t-digest ROLE
# with deterministic, oracle-replayable arithmetic. The exact equi-depth
# boundary table is the audit side: every estimate must land within one
# bin width of the true boundary.

HIST_BINS = 256


@register(
    "quantile_sketch_events",
    None,  # injected below: composes the equidepth exact-boundary oracle
    doc=f"Fixed-bin histogram quantile sketch ({HIST_BINS} bins over the "
    "cent domain, bounds fixed by a broadcast 1-row min/max pass) "
    "estimating every equi-depth boundary, audited against the EXACT "
    "boundary table (equidepth_bounds_events) with a within-one-bin-"
    "width verdict per row. The sketch state is {HIST_BINS} longs that "
    "merge by addition across partitions/days/DCs — at 100 TB the "
    "histogram answers any quantile from constant state while the "
    "exact side costs a distinct-cent cumulative; bin assignment is "
    "pure integer floor math ((v-lo)*B div span), the estimate the "
    "bin midpoint, and every float derives from the same exact "
    "integers in both engines so the verdict booleans hash-match. "
    "Corpus-sized work: the min/max agg and one map-side-combinable "
    f"groupBy(bin) shuffle of <= {HIST_BINS} rows per partition.",
)
def quantile_sketch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = _hist_stats(spark, sf_dir)
    cents = (
        _t(spark, sf_dir, "events")
        .select(F.round(F.col("value") * V_SCALE).cast("long").alias("v"))
    )
    bins = (
        cents.crossJoin(F.broadcast(stats))
        .select(F.expr(f"(v - lo) * {HIST_BINS} div span").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("bc"))
    )
    return _quantile_report(spark, sf_dir, bins, stats)


def _hist_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row (lo, span) calibration frame fixing the bin domain."""
    return (
        _t(spark, sf_dir, "events")
        .select(F.round(F.col("value") * V_SCALE).cast("long").alias("v"))
        .agg(
            F.min("v").alias("lo"),
            (F.max("v") - F.min("v") + 1).cast("long").alias("span"),
        )
    )


def _quantile_report(
    spark: SparkSession, sf_dir: str, bins: DataFrame, stats: DataFrame
) -> DataFrame:
    """Shared estimate side: bin-cumulative -> covering bin per exact
    equi-depth target rank -> midpoint estimate + one-bin-width verdict.
    ``bins``: (bin, bc) histogram state, from the batch or the streaming
    variant — the report is identical either way."""
    from qa_data_pipeline_rag_llm_spark.operators.cumulative import (
        rank_cumsum,
    )
    from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY

    bcum = rank_cumsum(
        bins, [F.asc("bin")], "bc", cumsum_col="bcm", bucket_col="bin"
    ).withColumn("bcm", F.col("bcm").cast("long"))
    exact = (
        REGISTRY["equidepth_bounds_events"]
        .spark(spark, sf_dir)
        .select(
            "bucket",
            "target_rank",
            "boundary",
            F.round(F.col("boundary") * V_SCALE).cast("long").alias("ev_c"),
        )
    )
    # covering bin of each target rank: 15 x HIST_BINS bounded range join
    est = (
        F.broadcast(exact)
        .join(
            bcum,
            (F.col("bcm") >= F.col("target_rank"))
            & (F.col("bcm") - F.col("bc") < F.col("target_rank")),
        )
        .crossJoin(F.broadcast(stats))
    )
    est_c = (
        F.col("lo").cast("double")
        + (F.col("bin").cast("double") + 0.5)
        * F.col("span").cast("double")
        / HIST_BINS
    )
    err_c = F.abs(est_c - F.col("ev_c").cast("double"))
    return est.select(
        "bucket",
        "target_rank",
        F.col("boundary").alias("exact_boundary"),
        (est_c / V_SCALE).alias("est"),
        (err_c / V_SCALE).alias("err"),
        (err_c <= F.col("span").cast("double") / HIST_BINS).alias(
            "within_one_bin"
        ),
    )


from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY as _R  # noqa: E402

_R["quantile_sketch_events"].oracle = f"""
    WITH exact AS ({_R["equidepth_bounds_events"].oracle}),
    vc AS (
      SELECT CAST(round(value * {V_SCALE}) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY CAST(round(value * {V_SCALE}) AS BIGINT)),
    stats AS (
      SELECT MIN(v) AS lo, CAST(MAX(v) - MIN(v) + 1 AS BIGINT) AS span
      FROM vc),
    bins AS (
      SELECT (v - lo) * {HIST_BINS} // span AS bin,
             CAST(SUM(c) AS BIGINT) AS bc
      FROM vc, stats GROUP BY 1),
    bcum AS (
      SELECT bin, bc, CAST(SUM(bc) OVER (ORDER BY bin) AS BIGINT) AS bcm
      FROM bins),
    joined AS (
      SELECT e.bucket, e.target_rank, e.boundary,
             CAST(round(e.boundary * {V_SCALE}) AS BIGINT) AS ev_c,
             b.bin, b.bc, s.lo, s.span
      FROM exact e
      JOIN bcum b ON b.bcm >= e.target_rank
                 AND b.bcm - b.bc < e.target_rank
      CROSS JOIN stats s)
    SELECT bucket, target_rank, boundary AS exact_boundary,
           (CAST(lo AS DOUBLE)
            + (CAST(bin AS DOUBLE) + 0.5) * CAST(span AS DOUBLE)
              / {HIST_BINS}) / {V_SCALE} AS est,
           abs(CAST(lo AS DOUBLE)
               + (CAST(bin AS DOUBLE) + 0.5) * CAST(span AS DOUBLE)
                 / {HIST_BINS}
               - CAST(ev_c AS DOUBLE)) / {V_SCALE} AS err,
           (abs(CAST(lo AS DOUBLE)
                + (CAST(bin AS DOUBLE) + 0.5) * CAST(span AS DOUBLE)
                  / {HIST_BINS}
                - CAST(ev_c AS DOUBLE))
            <= CAST(span AS DOUBLE) / {HIST_BINS}) AS within_one_bin
    FROM joined
"""


@register(
    "streaming_quantile_sketch_events",
    None,  # injected below: identical oracle — streaming replay is a
    # total function of the input files (the streaming_hll discipline)
    doc=f"Streaming twin of quantile_sketch_events: the {HIST_BINS}-bin "
    "histogram maintained AS the streaming state. The (lo, span) "
    "calibration frame is a static 1-row table joined into the stream "
    "(the standard stream-static calibration join — production fixes "
    "bin bounds from a calibration pass, then the state never moves), "
    "and the complete-mode groupBy(bin).count keeps exactly "
    f"{HIST_BINS} longs in the state store; per-micro-batch partial "
    "counts merge by ADDITION exactly as batch partitions do. "
    "AvailableNow replay makes the result a total function of the "
    "input, so the DuckDB oracle verifies the STREAMING path exactly — "
    "batch plan, streaming plan, and oracle all hash-identical. At "
    "100 TB/day the quantile dashboard costs constant state.",
)
def streaming_quantile_sketch_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        read_events_stream,
        run_to_completion,
    )

    stats = _hist_stats(spark, sf_dir)
    calib = stats.withColumn("_k", F.lit(1))
    ev = read_events_stream(spark, sf_dir)
    bins_stream = (
        ev.select(
            F.round(F.col("value") * V_SCALE).cast("long").alias("v"),
            F.lit(1).alias("_k"),
        )
        .join(calib, "_k")  # stream-static calibration join
        .select(F.expr(f"(v - lo) * {HIST_BINS} div span").alias("bin"))
        .groupBy("bin")
        .count()
    )
    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        state_partitions_for_input,
    )

    bins = run_to_completion(
        bins_stream,
        "complete",
        state_partitions_for_input(spark, sf_dir, tables=("events",)),
    ).select("bin", F.col("count").cast("long").alias("bc"))
    return _quantile_report(spark, sf_dir, bins, stats)


_R["streaming_quantile_sketch_events"].oracle = _R[
    "quantile_sketch_events"
].oracle
