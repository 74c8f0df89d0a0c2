"""Registry entries: Python UDTF surface + sketch aggregates + the
watermarked stream-stream join.

HLL/KLL estimates are implementation-defined, so DuckDB's approx
functions would never value-hash-match Spark's raw estimates. The sketch
query therefore registers the BOUNDS VERDICT (estimate within its error
budget of the exact answer, computed in the same pass) — deterministic,
driver-hashable; tests/test_sketches.py additionally pins the raw
estimates against exact answers.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register
from qa_data_pipeline_rag_llm_spark.streaming.events import (
    stream_stream_click_purchase,
    stream_stream_click_purchase_full,
    stream_stream_click_purchase_left,
    stream_user_type_profile,
)


@register(
    "udtf_token_counts",
    """
    SELECT token,
           COUNT(*) AS n,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id,
                 unnest(list_transform(
                   list_filter(regexp_split_to_array(text, '[\\W_]+'),
                               x -> x <> ''), x -> lower(x))) AS token
          FROM documents)
    GROUP BY token
    """,
    doc="Python UDTF (Spark 4 table function — no UDTF exists in the "
    "reference, SURVEY.md §2.12) applied via LATERAL: tokenize each "
    "document, aggregate global token frequencies. The UDTF is the "
    "deliberate slow-path twin of the built-in split() used by "
    "text_stats; registered to cover the API surface.",
)
def udtf_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.functions.udtf_tokenize import Tokenize

    fn = f"tokenize_{uuid.uuid4().hex[:8]}"
    spark.udtf.register(fn, Tokenize)
    view = f"docs_{uuid.uuid4().hex[:8]}"
    _t(spark, sf_dir, "documents").select("doc_id", "text").createOrReplaceTempView(
        view
    )
    return spark.sql(
        f"""
        SELECT t.token, COUNT(*) AS n, COUNT(DISTINCT d.doc_id) AS n_docs
        FROM {view} d, LATERAL {fn}(d.text) t
        GROUP BY t.token
        """
    )


def _sketch_stats_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch estimates per event_type (internal; estimates are
    impl-defined so they cannot be the registered driver-facing shape).

    r12: the scan is spread first (guide §2.5) — a single-file events
    scan plans as ONE task, and with only 4 groups the ENTIRE partial
    aggregation (HLL sketches, two KLL percentile sketches, the exact
    percentile buffer) ran on one core. The registered output is the
    bounds VERDICT, which is invariant to the partition layout the
    estimators see (budgets are 5% / ±0.01 rank; estimates themselves
    stay pinned in tests/test_sketches.py)."""
    from qa_data_pipeline_rag_llm_spark.operators.util import (
        ensure_parallelism,
    )

    ev = ensure_parallelism(_t(spark, sf_dir, "events"))
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("hll_users"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("p50"),
        F.percentile_approx("value", F.lit(0.95), F.lit(10000)).alias("p95"),
        # exact references for the verdict columns, same single pass
        F.count_distinct("user_id").alias("exact_users"),
        F.expr("percentile(value, array(0.49, 0.51, 0.94, 0.96))").alias("pb"),
    )


@register(
    "sketch_stats_events",
    """
    SELECT event_type, COUNT(*) AS n,
           TRUE AS approx_users_ok, TRUE AS hll_users_ok,
           TRUE AS p50_ok, TRUE AS p95_ok
    FROM events GROUP BY event_type
    """,
    doc="Sketch aggregates for 100 TB cardinality/quantile work: HLL "
    "(hll_sketch_agg — mergeable across partitions, Apache DataSketches "
    "wire format) vs approx_count_distinct (HLL++), plus KLL-style "
    "approx_percentile. One pass, constant memory per group — the scale "
    "path where exact COUNT(DISTINCT)/percentile_approx would shuffle "
    "every distinct value. Estimates are impl-defined, so the registered "
    "output is the per-group BOUNDS VERDICT the driver can hash (VERDICT "
    "r04 #3): each estimate within its published error budget of the "
    "exact answer computed in the same pass (5% for both HLL forms — "
    "lgK=12 standard error is ~1.6%; rank window ±0.01 for the "
    "1e-4-accuracy percentiles). An estimator outside its budget flips "
    "a boolean; raw estimates stay pinned in tests/test_sketches.py.",
)
def sketch_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _sketch_stats_raw(spark, sf_dir)

    def _cd_ok(est: str) -> F.Column:
        budget = F.greatest(F.lit(2.0), 0.05 * F.col("exact_users"))
        return F.abs(F.col(est) - F.col("exact_users")) <= budget

    return raw.select(
        "event_type",
        "n",
        _cd_ok("approx_users").alias("approx_users_ok"),
        _cd_ok("hll_users").alias("hll_users_ok"),
        F.col("p50").between(F.col("pb")[0], F.col("pb")[1]).alias("p50_ok"),
        F.col("p95").between(F.col("pb")[2], F.col("pb")[3]).alias("p95_ok"),
    )


@register(
    "streaming_click_purchase_join",
    """
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           p.value AS purchase_value
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    doc="Watermarked stream-stream inner join (clicks x purchases within "
    "30 min): the time-range predicate + 2h watermarks bound the join "
    "state; oracle is the equivalent batch interval self-join.",
)
def streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_stream_click_purchase(spark, sf_dir)


@register(
    "streaming_click_purchase_left",
    """
    WITH c AS (
      SELECT user_id, ts AS click_ts, event_id AS click_id
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id AS p_user_id, ts AS purchase_ts,
             event_id AS purchase_id, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    ), wm AS (
      SELECT least((SELECT MAX(click_ts) FROM c),
                   (SELECT MAX(purchase_ts) FROM p))
             - INTERVAL 2 HOUR AS w
    ), j AS (
      SELECT c.user_id, c.click_id, c.click_ts,
             p.purchase_id, p.purchase_value
      FROM c LEFT JOIN p
        ON c.user_id = p.p_user_id
       AND p.purchase_ts > c.click_ts
       AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
    SELECT user_id, click_id, purchase_id, purchase_value
    FROM j, wm
    WHERE purchase_id IS NOT NULL
       OR click_ts + INTERVAL 30 MINUTE < wm.w
    """,
    doc="Watermarked stream-stream LEFT OUTER join restricted to its "
    "deterministic subset: matched rows emit on arrival; NULL rows only "
    "once the watermark passes their 30-min window, so both sides filter "
    "to windows strictly below the final-watermark horizon (the "
    "unemitted NULL tail at end-of-input is documented in "
    "streaming/events.py). Oracle = batch left interval join under the "
    "same horizon predicate.",
)
def streaming_click_purchase_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_stream_click_purchase_left(spark, sf_dir)


@register(
    "streaming_click_purchase_full",
    """
    WITH c AS (
      SELECT user_id, ts AS click_ts, event_id AS click_id
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id AS p_user_id, ts AS purchase_ts, event_id AS purchase_id
      FROM events WHERE event_type = 'purchase'
    ), wm AS (
      SELECT least((SELECT MAX(click_ts) FROM c),
                   (SELECT MAX(purchase_ts) FROM p))
             - INTERVAL 2 HOUR AS w
    ), j AS (
      SELECT COALESCE(c.user_id, p.p_user_id) AS user_id,
             c.click_id, c.click_ts, p.purchase_id, p.purchase_ts
      FROM c FULL OUTER JOIN p
        ON c.user_id = p.p_user_id
       AND p.purchase_ts > c.click_ts
       AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
    SELECT user_id, click_id, purchase_id
    FROM j, wm
    WHERE (click_id IS NOT NULL AND purchase_id IS NOT NULL)
       OR (purchase_id IS NULL AND click_ts + INTERVAL 30 MINUTE < wm.w)
       OR (click_id IS NULL AND purchase_ts < wm.w)
    """,
    doc="Watermarked stream-stream FULL OUTER join, deterministic subset "
    "(completes the inner/left/full matrix): both sides' NULL rows are "
    "kept only below the final-watermark horizon — a purchase's window "
    "is the 30 min before it, so its bound is its own timestamp. Oracle "
    "= batch full interval join under the same horizon predicates.",
)
def streaming_click_purchase_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_stream_click_purchase_full(spark, sf_dir)


@register(
    "streaming_user_type_profile",
    """
    WITH per_type AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type),
    ranked AS (
      SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn
      FROM per_type)
    SELECT user_id,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS INT) AS n_types,
           MAX(CASE WHEN rn = 1 THEN event_type END) AS top_type
    FROM ranked GROUP BY user_id
    """,
    doc="Arbitrary-state streaming (Spark 4 transformWithStateInPandas): "
    "per-user type profile in composite MapState — each map entry is an "
    "individual state-store key, so one update never rewrites the whole "
    "user state. Deterministic top-type tie-break; final emission "
    "equals the batch aggregate.",
)
def streaming_user_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_user_type_profile(spark, sf_dir)


@register(
    "streaming_foreachbatch_sink",
    """
    SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_distinct
    FROM events GROUP BY event_type
    """,
    doc="foreachBatch parquet sink (the production streaming→storage "
    "path): each micro-batch written distributed, partitioned by "
    "event_type, tagged with batch_id for idempotent restart; the sink "
    "is read back and aggregated to prove exactly-once delivery.",
)
def streaming_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        stream_to_parquet_foreach_batch,
    )

    return stream_to_parquet_foreach_batch(spark, sf_dir)


@register(
    "streaming_dedup_within_watermark",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_pairs
    FROM events GROUP BY event_type
    """,
    doc="dropDuplicatesWithinWatermark: dedup state is EVICTED as the "
    "watermark passes each key (plain streaming dropDuplicates keeps "
    "key state forever — unusable on an unbounded stream). Aggregated "
    "to per-type distinct-pair counts so the check is deterministic "
    "regardless of which physical row survived.",
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        stream_dedup_within_watermark,
    )

    return stream_dedup_within_watermark(spark, sf_dir)
