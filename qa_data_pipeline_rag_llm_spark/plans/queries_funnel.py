"""Registry entries: funnel and retention-cohort analytics over events.

The product-analytics pair every event pipeline eventually needs: ordered
conversion funnels (stage N must happen at-or-after stage N-1) and
cohort retention grids (users bucketed by first-seen period × activity
offset). Both are pure integer/time logic — fully oracle-checked.

Scale notes: each stage/cohort pass is one groupBy on user_id — AQE
reuses the shuffle partitioning across the chained aggregations; the
cohort grid's second aggregation is on (cohort, offset), a tiny result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register
from qa_data_pipeline_rag_llm_spark.plans.queries_sampling import (
    _DUCK_BUCKET,
    _SPARK_BUCKET,
)


@register(
    "funnel_events",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.v_ts
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_view_click_purchase
    """,
    doc="Ordered 3-stage conversion funnel (view → click at-or-after the "
    "first view → purchase at-or-after that click): each stage is one "
    "semi-scoped aggregate joined to the previous stage's first-hit "
    "time — ORDERED funnel semantics, not mere event-type presence.",
)
def funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    # broadcast hints lock the 1-row-combine plan shape (BNLJ over a
    # broadcast side) instead of leaving it to AQE (VERDICT r01 #8)
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(F.broadcast(c.agg(F.count("*").alias("n_view_click"))))
        .crossJoin(
            F.broadcast(p.agg(F.count("*").alias("n_view_click_purchase")))
        )
    )


@register(
    "user_growth_daily",
    """
    WITH first_seen AS (
      SELECT user_id,
             MIN(epoch_us(ts) // 86400000000) AS day FROM events
      GROUP BY user_id
    ), daily AS (
      SELECT day, COUNT(*) AS n_new FROM first_seen GROUP BY day)
    SELECT day, n_new,
           CAST(SUM(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM daily
    """,
    doc="User growth curve: first-seen day per user (integer epoch days), "
    "new-user counts, cumulative total — the expanding-distinct-count "
    "that would be quadratic done the naive way, linear via first-seen "
    "reduction. Cumulative window runs on the tiny per-day aggregate.",
)
def user_growth_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.expr("MIN(unix_micros(ts) div 86400000000)").alias("day")
    )
    daily = first_seen.groupBy("day").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("day")
    return daily.select(
        "day", "n_new", F.sum("n_new").over(w).alias("cum_users")
    )


@register(
    "time_to_convert_events",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
      GROUP BY e.user_id
    ), gaps AS (
      SELECT (epoch_us(p.p_ts) - epoch_us(v.v_ts)) // 1000000 AS gap_s
      FROM p JOIN v ON v.user_id = p.user_id)
    SELECT COUNT(*) AS n_converted,
           round(quantile_cont(gap_s, 0.5), 2) AS p50_s,
           round(quantile_cont(gap_s, 0.9), 2) AS p90_s
    FROM gaps
    """,
    doc="Time-to-convert distribution: integer-second gaps between each "
    "converting user's first view and first at-or-after purchase, "
    "summarized as interpolated percentiles — the latency lens on the "
    "ordered funnel.",
)
def time_to_convert_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    gaps = p.join(v, "user_id").select(
        F.expr(
            "(unix_micros(p_ts) - unix_micros(v_ts)) div 1000000"
        ).alias("gap_s")
    )
    return gaps.agg(
        F.count("*").alias("n_converted"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 2).alias("p50_s"),
        F.round(F.expr("percentile(gap_s, 0.9)"), 2).alias("p90_s"),
    )


@register(
    "retention_cohorts_events",
    """
    WITH weeks AS (
      SELECT user_id,
             epoch_us(ts) // (86400000000 * 7) AS wk
      FROM events
    ), first_seen AS (
      SELECT user_id, MIN(wk) AS cohort_wk FROM weeks GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT w.user_id, f.cohort_wk,
             CAST(w.wk - f.cohort_wk AS INTEGER) AS week_offset
      FROM weeks w JOIN first_seen f ON f.user_id = w.user_id
    )
    SELECT cohort_wk, week_offset, COUNT(*) AS n_users
    FROM activity GROUP BY cohort_wk, week_offset
    """,
    doc="Retention cohort grid: users bucketed by first-seen epoch week, "
    "counted per activity-week offset — week ids are integer floor "
    "divisions of epoch µs, so bucketing is exact in both engines (no "
    "calendar/timezone arithmetic to drift).",
)
def retention_cohorts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div (86400000000 * 7)").alias("wk"),
    )
    first_seen = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    activity = (
        weeks.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_wk", "week_offset").agg(
        F.count("*").alias("n_users")
    )


@register(
    "event_path_counts",
    """
    WITH paths AS (
      SELECT user_id, COUNT(*) AS n_events,
             string_agg(event_type, ',' ORDER BY ts, event_id) AS path
      FROM events GROUP BY user_id)
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(path, 'view,click,purchase'))
                AS INTEGER) AS n_vcp_runs
    FROM paths
    """,
    doc="Behavioral path-pattern matching: each user's event sequence "
    "(deterministic ts,event_id order) collapsed to a path string, then "
    "the contiguous view→click→purchase motif counted by regex — the "
    "sequence-analytics complement to the ordered funnel (which asks "
    "'ever, in order'; this asks 'as an immediate run, how often'). One "
    "shuffle on user_id; the path regex is whole-stage codegen'd.",
)
def event_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    paths = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.concat_ws(
            ",",
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).event_type,
        ).alias("path"),
    )
    return paths.select(
        "user_id",
        "n_events",
        F.regexp_count("path", F.lit("view,click,purchase"))
        .cast("int")
        .alias("n_vcp_runs"),
    )


@register(
    "abtest_conversion_events",
    f"""
    WITH users AS (
      SELECT user_id,
             CASE WHEN {_DUCK_BUCKET.format(key="user_id")} < 128
                  THEN 'A' ELSE 'B' END AS variant,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id),
    v AS (
      SELECT
        SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS n_a,
        SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS n_b,
        SUM(CASE WHEN variant = 'A' THEN converted ELSE 0 END) AS conv_a,
        SUM(CASE WHEN variant = 'B' THEN converted ELSE 0 END) AS conv_b
      FROM users)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
           round(conv_a * 1.0 / n_a, 6) AS rate_a,
           round(conv_b * 1.0 / n_b, 6) AS rate_b,
           CASE WHEN (conv_a + conv_b) > 0 AND (conv_a + conv_b) < (n_a + n_b)
                THEN round((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
                     / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                            * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)), 4) END AS z_stat
    FROM v
    """,
    doc="A/B experiment readout: users split deterministically by md5 "
    "bucket (the cross-engine-checkable twin of random assignment), "
    "per-variant purchase conversion, and the two-proportion z-test "
    "statistic — the decision number an experimentation platform "
    "serves. Exact integer counts; the z arithmetic is identical "
    "IEEE double expression shape in both engines. One user-level "
    "aggregate then a single-row reduction.",
)
def abtest_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bucket = F.expr(_SPARK_BUCKET.format(key="user_id"))
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        F.when(bucket < 128, "A").otherwise("B").alias("variant"),
        "converted",
    )
    v = users.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("variant") == "A", F.col("converted")).otherwise(0)
        ).alias("conv_a"),
        F.sum(
            F.when(F.col("variant") == "B", F.col("converted")).otherwise(0)
        ).alias("conv_b"),
    )
    rate_a = F.col("conv_a") * 1.0 / F.col("n_a")
    rate_b = F.col("conv_b") * 1.0 / F.col("n_b")
    p_pool = (F.col("conv_a") + F.col("conv_b")) * 1.0 / (
        F.col("n_a") + F.col("n_b")
    )
    tot_conv = F.col("conv_a") + F.col("conv_b")
    tot_n = F.col("n_a") + F.col("n_b")
    z = F.when(
        (tot_conv > 0) & (tot_conv < tot_n),  # degenerate p∈{0,1}: no var
        F.round(
            (rate_a - rate_b)
            / F.sqrt(
                p_pool
                * (1.0 - p_pool)
                * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
            ),
            4,
        ),
    )
    return v.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        z.alias("z_stat"),
    )


PARETO_TARGET = 0.8


@register(
    "pareto_users_events",
    f"""
    WITH per_user AS (
      SELECT user_id,
             SUM(CAST(round(value * 1000000) AS BIGINT)) AS v_micro
      FROM events GROUP BY user_id),
    ranked AS (
      SELECT user_id, v_micro,
             ROW_NUMBER() OVER (ORDER BY v_micro DESC, user_id) AS user_rank,
             SUM(v_micro) OVER (ORDER BY v_micro DESC, user_id
                                ROWS UNBOUNDED PRECEDING) AS cum_micro,
             SUM(v_micro) OVER () AS total_micro,
             COUNT(*) OVER () AS n_users
      FROM per_user)
    SELECT CAST(user_rank AS INTEGER) AS user_rank, user_id,
           round(v_micro / 1000000.0, 4) AS user_value,
           round(cum_micro * 1.0 / total_micro, 6) AS cum_share,
           round(user_rank * 1.0 / n_users, 6) AS user_share
    FROM ranked
    WHERE cum_micro - v_micro < total_micro * {PARETO_TARGET}
    """,
    doc="Pareto concentration: the smallest value-ranked user set "
    "producing 80% of total event value (each row a member with its "
    "cumulative share — the last row crosses the target; user_share "
    "at that row IS the Pareto point). Per-user totals sum exactly in "
    "micro-units; the boundary predicate is exact integer math. Rank and "
    "running sum use the two-pass partition-offset pattern "
    "(operators/cumulative.py) — no single-task global window even "
    "though the per-user frame grows with the data.",
)
def pareto_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.operators.cumulative import (
        rank_cumsum,
    )

    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("v_micro")
    )
    # Global rank + running sum via the two-pass partition-offset pattern
    # (operators/cumulative.py) — the per-user frame grows with the data,
    # so a bare Window.orderBy would be a single-task sort (VERDICT r02
    # #1). Totals come from a one-row aggregate broadcast back.
    totals = per_user.agg(
        F.sum("v_micro").alias("total_micro"),
        F.count("*").alias("n_users"),
    )
    ranked = (
        rank_cumsum(
            per_user,
            [F.desc("v_micro"), F.col("user_id")],
            "v_micro",
            rank_col="user_rank",
            cumsum_col="cum_micro",
            bucket_col="v_micro",
            descending=True,
        )
        .withColumn("user_rank", F.col("user_rank").cast("int"))
        .crossJoin(F.broadcast(totals))
    )
    return ranked.filter(
        F.col("cum_micro") - F.col("v_micro")
        < F.col("total_micro") * PARETO_TARGET
    ).select(
        "user_rank",
        "user_id",
        F.round(F.col("v_micro") / 1000000.0, 4).alias("user_value"),
        F.round(F.col("cum_micro") * 1.0 / F.col("total_micro"), 6).alias(
            "cum_share"
        ),
        F.round(F.col("user_rank") * 1.0 / F.col("n_users"), 6).alias(
            "user_share"
        ),
    )


@register(
    "repeat_rate_cohorts",
    """
    WITH per_cust AS (
      SELECT o_custkey,
             strftime(MIN(o_orderdate), '%Y-%m') AS cohort_month,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey)
    SELECT cohort_month,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           round(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS repeat_rate
    FROM per_cust GROUP BY cohort_month
    """,
    doc="Cohort repeat rate: customers grouped by first-order month, "
    "share that ever ordered again — the loyalty readout next to "
    "retention_cohorts_events' activity view. Two combinable "
    "aggregates, no window.",
)
def repeat_rate_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM").alias("cohort_month"),
        F.count("*").alias("n_orders"),
    )
    repeat = F.when(F.col("n_orders") >= 2, 1).otherwise(0)
    return per_cust.groupBy("cohort_month").agg(
        F.count("*").alias("n_customers"),
        F.sum(repeat).alias("n_repeat"),
        F.round(F.sum(repeat) * 1.0 / F.count("*"), 6).alias("repeat_rate"),
    )
