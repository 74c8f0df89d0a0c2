"""Registry entries: temporal joins (as-of, windowed range self-join).

Absent from the reference (SURVEY.md §2.4 — "no theta, range, as-of,
interval, or anti joins appear") but core to event-data preparation at
scale. DuckDB's native ASOF JOIN is the oracle for the as-of operator, so
the non-trivial carry-forward plan is value-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.operators.temporal import (
    asof_join,
    range_self_join_pairs,
)
from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register

_PAIR_WINDOW_US = 1800 * 1_000_000  # 30 minutes


@register(
    "asof_click_before_purchase",
    """
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), purchases AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.event_id,
           c.click_event_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    bench=True,
    doc="As-of join: each purchase event gets the most recent prior-or-equal "
    "click of the same user (NULL when none). Implemented as union-tag + "
    "carry-forward window — ONE shuffle on user_id, no pair explosion "
    "(operators/temporal.py); oracle is DuckDB's native ASOF JOIN. Ties "
    "on click ts are pre-collapsed to max(event_id) for determinism.",
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks.withColumnRenamed("ts", "click_ts"),
        keys=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_event_id", "click_ts"],
    )
    return out.select(
        "user_id",
        "event_id",
        "click_event_id",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )


@register(
    "events_close_pairs",
    f"""
    SELECT a.user_id,
           a.event_id AS event_id_a,
           b.event_id AS event_id_b,
           abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us,
           a.event_type AS event_type_a,
           b.event_type AS event_type_b
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
    WHERE abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {_PAIR_WINDOW_US}
    """,
    doc="Windowed range self-join: pairs of same-user events within 30 "
    "minutes, found via time-bucket blocking (equal/adjacent bucket join) "
    "instead of a per-user cross product — candidate count scales with "
    "bucket density, not rows² (operators/temporal.py).",
)
def events_close_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return range_self_join_pairs(
        ev,
        keys=["user_id"],
        ts="ts",
        id_col="event_id",
        window_us=_PAIR_WINDOW_US,
        extra_cols=["event_type"],
    )


@register(
    "gapfill_user_daily",
    """
    WITH base AS (
      SELECT user_id, date_trunc('day', ts) AS day, ts, event_id, event_type
      FROM events),
    counts AS (SELECT user_id, day, COUNT(*) AS n FROM base GROUP BY 1, 2),
    lastt AS (
      SELECT user_id, day, event_type AS day_type FROM (
        SELECT user_id, day, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, day
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM base) WHERE rn = 1),
    bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
               FROM base GROUP BY user_id),
    spine AS (SELECT user_id,
                     unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
              FROM bounds),
    j AS (SELECT s.user_id, s.day,
                 coalesce(c.n, 0) AS n, l.day_type
          FROM spine s
          LEFT JOIN counts c ON s.user_id = c.user_id AND s.day = c.day
          LEFT JOIN lastt l ON s.user_id = l.user_id AND s.day = l.day)
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n,
           CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
           last_value(day_type IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS ff_type
    FROM j
    """,
    doc="Time-series regularization: per-user dense daily spine "
    "(sequence+explode between each user's own bounds), zero-filled "
    "counts, running cumulative total, and forward-filled categorical "
    "state via last(ignorenulls) — the resample/ffill shape every "
    "feature pipeline needs, absent from the reference entirely.",
)
def gapfill_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.operators.timeseries import gapfill_daily

    return gapfill_daily(_t(spark, sf_dir, "events"))


ASOF_TOLERANCE_US = 3_600_000_000  # 1 hour


@register(
    "asof_tolerance_click_purchase",
    f"""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), purchases AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ), matched AS (
      SELECT p.user_id, p.event_id, c.click_event_id,
             epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts)
    SELECT user_id, event_id,
           CASE WHEN gap_us <= {ASOF_TOLERANCE_US}
                THEN click_event_id END AS click_event_id,
           CASE WHEN gap_us <= {ASOF_TOLERANCE_US}
                THEN gap_us END AS gap_us,
           gap_us IS NOT NULL AND gap_us <= {ASOF_TOLERANCE_US} AS attributed
    FROM matched
    """,
    doc="As-of join with a match TOLERANCE (pandas merge_asof semantics): "
    "a prior click only attributes a purchase if it happened within the "
    "last hour — stale matches are nulled, and the attributed flag "
    "makes the windowed-attribution rate directly aggregable. Same "
    "one-shuffle carry-forward plan as asof_click_before_purchase; the "
    "tolerance is a post-window projection, costing nothing extra.",
)
def asof_tolerance_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks.withColumnRenamed("ts", "click_ts"),
        keys=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_event_id", "click_ts"],
    )
    gap = F.unix_micros("ts") - F.unix_micros("click_ts")
    in_tol = gap <= ASOF_TOLERANCE_US
    return out.select(
        "user_id",
        "event_id",
        F.when(in_tol, F.col("click_event_id")).alias("click_event_id"),
        F.when(in_tol, gap).alias("gap_us"),
        (gap.isNotNull() & in_tol).alias("attributed"),
    )


ATTR_WINDOW_US = 3_600_000_000  # linear-attribution lookback: 1 hour


@register(
    "attribution_linear_events",
    f"""
    WITH purchases AS (
      SELECT event_id AS p_event, user_id, epoch_us(ts) AS p_us, value
      FROM events WHERE event_type = 'purchase'),
    clicks AS (
      SELECT event_id AS click_event_id, user_id, epoch_us(ts) AS c_us
      FROM events WHERE event_type = 'click'),
    touched AS (
      SELECT p.p_event, p.value, c.click_event_id, c.user_id,
             COUNT(*) OVER (PARTITION BY p.p_event) AS n_touch
      FROM purchases p JOIN clicks c
        ON p.user_id = c.user_id
       AND p.p_us - c.c_us BETWEEN 0 AND {ATTR_WINDOW_US})
    SELECT click_event_id, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           round(CAST(SUM(CAST(round(value / n_touch, 6)
                          AS DECIMAL(18,6))) AS DOUBLE), 4)
             AS attributed_value
    FROM touched GROUP BY click_event_id, user_id
    """,
    doc="Linear multi-touch attribution: every click in the hour before "
    "a purchase shares that purchase's value equally; per-click credits "
    "sum exactly (6-dp rounded credits accumulate in DECIMAL so the "
    "total is order-independent). The Spark plan blocks the range join "
    "through 1-hour time buckets (purchase side probes its own and the "
    "previous bucket) — candidates are bounded by per-bucket density, "
    "never per-user row counts squared. Complements the single-touch "
    "as-of queries.",
)
def attribution_linear_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event"),
            "user_id",
            us.alias("p_us"),
            "value",
            (us / ATTR_WINDOW_US).cast("long").alias("bucket"),
        )
        .select(
            "p_event",
            "user_id",
            "p_us",
            "value",
            F.explode(
                F.array(F.col("bucket") - 1, F.col("bucket"))
            ).alias("jbucket"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id").alias("c_user"),
        us.alias("c_us"),
        (us / ATTR_WINDOW_US).cast("long").alias("jbucket"),
    )
    gap = F.col("p_us") - F.col("c_us")
    touched = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (purchases["jbucket"] == clicks["jbucket"]),
    ).filter((gap >= 0) & (gap <= ATTR_WINDOW_US))
    n_touch = F.count("*").over(Window.partitionBy("p_event"))
    credit = F.round(F.col("value") / n_touch, 6).cast("decimal(18,6)")
    return (
        touched.select("click_event_id", "user_id", credit.alias("credit"))
        .groupBy("click_event_id", "user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("credit").cast("double"), 4).alias(
                "attributed_value"
            ),
        )
    )


# ---------------------------------------------------------------------------
# SCD2 dimension history + interval concurrency (extension surface: the
# reference keeps no history at all — each run of its pipeline overwrites
# the prior CSV snapshot at a fixed object name (REDDIT-Nettoyage-Posts.py:65,
# PLATFORM-Merge.py:61 re-putting the cleaneddata objects) — so slowly-
# changing-dimension tracking is the warehouse capability it lacks).

_SID_FACTOR = 1_000_000_000  # sess_id < 1e9 per user ⇒ collision-free sid


def _scd2_versions(ev: DataFrame) -> DataFrame:
    """Shared SCD2 kernel: run-compress an event log (user_id,
    event_type, ts, event_id) into versioned state rows (user_id,
    version, state, vfrom, vto) — vto NULL for the open version.
    Every window partitions by user_id; one key shuffle total."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # the first row per key is ALWAYS a change (version 1) even when its
    # state is NULL — eqNullSafe(NULL, lag=NULL) would otherwise call it
    # "unchanged" (version 0), diverging from the streaming kernel's
    # sentinel-prev 1-based numbering and breaking the dense-1..n
    # invariant (advice r03)
    chg = (
        F.when(F.row_number().over(w) == 1, 1)
        .when(
            F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 0
        )
        .otherwise(1)
    )
    v = ev.withColumn("chg", chg).withColumn(
        "version",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )
    grp = v.groupBy("user_id", "version").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("vfrom"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return grp.withColumn("vto", F.lead("vfrom").over(wv))


# full-log SCD2 recompute — the oracle for the batch build, the
# incremental merge (merge ≡ recompute, same proof shape as
# incremental_agg_merge_events), and the streaming emitter; one text,
# kept in the leaf fragments module so composing modules never import
# each other mid-initialization
from qa_data_pipeline_rag_llm_spark.plans.oracle_fragments import (
    O_SCD2_FULL as _O_SCD2_FULL,
)


@register(
    "scd2_user_state_events",
    _O_SCD2_FULL,
    doc="Type-2 slowly-changing-dimension build from an event log: "
    "consecutive same-state events collapse into one version row with "
    "[valid_from, valid_to) in epoch micros, open-ended (NULL) for the "
    "current version — the standard warehouse history table the "
    "reference's overwrite-everything pipeline cannot produce. Every "
    "window is partitioned by the dimension key: one user_id shuffle, "
    "per-key frames stay executor-sized at any corpus scale.",
)
def scd2_user_state_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return _scd2_us_shape(_scd2_versions(ev))


def _scd2_us_shape(versions: DataFrame) -> DataFrame:
    """Project the shared SCD2 kernel output to the registry schema
    (epoch-micro validity bounds + is_current flag)."""
    return versions.select(
        "user_id",
        "version",
        "state",
        F.unix_micros("vfrom").alias("valid_from_us"),
        F.unix_micros("vto").alias("valid_to_us"),
        F.col("vto").isNull().alias("is_current"),
    )


@register(
    "peak_concurrency_daily",
    f"""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM g
    ), iv AS (
      SELECT user_id, sess_id,
             MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us
      FROM s GROUP BY user_id, sess_id
    ), b AS (
      SELECT user_id * {_SID_FACTOR} + sess_id AS sid, s_us AS us,
             1 AS delta FROM iv
      UNION ALL
      SELECT user_id * {_SID_FACTOR} + sess_id, e_us, -1 FROM iv
    ), c AS (
      SELECT us, delta,
             SUM(delta) OVER (ORDER BY us, delta, sid
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM b
    )
    SELECT strftime(make_timestamp(us), '%Y-%m-%d') AS day,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS sessions_started
    FROM c GROUP BY 1
    """,
    doc="Peak concurrent sessions per day (capacity planning): sessions "
    "(30-min gap rule) become ±1 boundary events — ends sort before "
    "starts at the same instant, so half-open [start, end) intervals "
    "never double-count — and the global ordered running sum runs as "
    "the two-pass partition-offset pattern (operators/cumulative.py), "
    "never a single-task window, even though the boundary frame is "
    "2×sessions and grows with the data. Peak is sampled at boundary "
    "instants; single-event sessions are zero-length and contribute "
    "nothing (documented).",
)
def peak_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.operators.cumulative import (
        rank_cumsum,
    )

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    sess = ev.withColumn(
        "new_sess", F.when(gap > 1800 * 1_000_000, 1).otherwise(0)
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    iv = sess.groupBy("user_id", "sess_id").agg(
        F.min(F.unix_micros("ts")).alias("s_us"),
        F.max(F.unix_micros("ts")).alias("e_us"),
    )
    sid = (F.col("user_id") * _SID_FACTOR + F.col("sess_id")).alias("sid")
    b = iv.select(sid, F.col("s_us").alias("us"), F.lit(1).alias("delta")).unionByName(
        iv.select(sid, F.col("e_us").alias("us"), F.lit(-1).alias("delta"))
    )
    c = rank_cumsum(
        b,
        [F.col("us"), F.col("delta"), F.col("sid")],
        "delta",
        cumsum_col="conc",
        bucket_col="us",
    )
    return c.groupBy(
        F.date_format(F.timestamp_micros(F.col("us")), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(
        F.max("conc").cast("long").alias("peak_concurrency"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("sessions_started"),
    )


_O_SCD2_NONPURCHASE = """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN ROW_NUMBER()
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
                    OR event_type IS DISTINCT FROM LAG(event_type)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS chg
      FROM events WHERE event_type != 'purchase'
    ), v AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM o
    ), grp AS (
      SELECT user_id, CAST(version AS INTEGER) AS version,
             MIN(event_type) AS state, MIN(epoch_us(ts)) AS vfrom_us
      FROM v GROUP BY user_id, version
    )
    SELECT user_id, version, state, vfrom_us,
           LEAD(vfrom_us)
             OVER (PARTITION BY user_id ORDER BY version) AS vto_us
    FROM grp
"""


@register(
    "pit_state_at_purchase",
    f"""
    WITH iv AS ({_O_SCD2_NONPURCHASE}),
    p AS (
      SELECT user_id, event_id, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase')
    SELECT p.user_id, p.event_id, iv.state,
           iv.version AS state_version
    FROM p LEFT JOIN iv
      ON iv.user_id = p.user_id
     AND p.p_us >= iv.vfrom_us
     AND (iv.vto_us IS NULL OR p.p_us < iv.vto_us)
    """,
    doc="Point-in-time join: each purchase is enriched with the SCD2 "
    "state version (built from the user's non-purchase events) whose "
    "[valid_from, valid_to) interval covers the purchase instant — the "
    "canonical feature-store lookup ('what did we know about the user "
    "when the event happened'), which the reference's latest-snapshot "
    "joins cannot answer. Intervals tile time per user, so exactly one "
    "version matches (NULL when the purchase predates any state). The "
    "join is hash-equi on user_id with a residual range predicate: one "
    "key shuffle, per-user interval lists stay executor-sized at any "
    "corpus scale — never an interval cross-product.",
)
def pit_state_at_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    iv = _scd2_versions(ev.filter(F.col("event_type") != "purchase")).select(
        F.col("user_id").alias("iv_user"),
        "version",
        "state",
        F.unix_micros("vfrom").alias("vfrom_us"),
        F.unix_micros("vto").alias("vto_us"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros("ts").alias("p_us")
    )
    joined = p.join(
        iv,
        (F.col("iv_user") == F.col("user_id"))
        & (F.col("p_us") >= F.col("vfrom_us"))
        & (F.col("vto_us").isNull() | (F.col("p_us") < F.col("vto_us"))),
        "left",
    )
    return joined.select(
        "user_id",
        "event_id",
        "state",
        F.col("version").alias("state_version"),
    )


# Day-of-month boundary splitting "already-built history" from "tonight's
# delta" (events span one month; ≤20 puts ~2/3 in history — same split as
# queries_audit.IVM_CUTOFF_DAY).
SCD2_CUTOFF_DAY = 20


@register(
    "incremental_scd2_merge_events",
    _O_SCD2_FULL,
    doc="Incremental SCD2 maintenance: the history partition (day ≤ "
    f"{SCD2_CUTOFF_DAY}) is built once; the nightly delta is merged by "
    "recomputing ONLY each touched user's tail — closed versions are "
    "carried over untouched, the open version is re-derived from a "
    "per-user seed row (its state + valid_from) unioned with the delta "
    "events, and version numbers re-offset by the user's closed count. "
    "The oracle recomputes SCD2 from the FULL log, proving merge ≡ "
    "recompute (the same algebraic gate as incremental_agg_merge_events)"
    " — at 100 TB the nightly job touches the delta plus one seed row "
    "per active user, never the history partition's event rows. All "
    "joins/windows key on user_id; seed/closed frames are one row per "
    "(user, version), bounded by state-change count, not event count.",
)
def incremental_scd2_merge_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    hist_ev = ev.filter(F.dayofmonth("ts") <= SCD2_CUTOFF_DAY)
    delta_ev = ev.filter(F.dayofmonth("ts") > SCD2_CUTOFF_DAY)

    hist = _scd2_versions(hist_ev)
    closed = hist.filter(F.col("vto").isNotNull())
    cur = hist.filter(F.col("vto").isNull()).select(
        "user_id",
        F.col("version").alias("version0"),
        "state",
        "vfrom",
    )
    # one synthetic seed event per user carries the open version's state
    # into the tail recompute; event_id −1 sorts before any real event
    # at the same instant (real ids are ≥0)
    seed = cur.select(
        "user_id",
        F.col("state").alias("event_type"),
        F.col("vfrom").alias("ts"),
        F.lit(-1).cast("long").alias("event_id"),
    )
    tail = _scd2_versions(delta_ev.unionByName(seed))
    offs = cur.select("user_id", (F.col("version0") - 1).alias("voff"))
    tail_off = tail.join(offs, "user_id", "left").withColumn(
        "version",
        (F.col("version") + F.coalesce(F.col("voff"), F.lit(0))).cast(
            "int"
        ),
    )
    merged = closed.select(
        "user_id", "version", "state", "vfrom", "vto"
    ).unionByName(
        tail_off.select("user_id", "version", "state", "vfrom", "vto")
    )
    return _scd2_us_shape(merged)
