"""Registry entries: Structured Streaming paths, oracle-checked.

Both queries execute a real streaming plan (file source → event-time /
stateful operator → memory sink, Trigger.AvailableNow) and return the final
result as a batch DataFrame. Because AvailableNow drains all input, the
output is a total function of the files — so the same DuckDB oracle that
checks batch queries checks the STREAMING engine end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from qa_data_pipeline_rag_llm_spark.plans.queries import register
from qa_data_pipeline_rag_llm_spark.streaming.events import (
    stream_hourly_counts,
    stream_user_running_totals,
)


@register(
    "streaming_events_hourly",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Streaming twin of events_hourly: tumbling 1-hour event-time window "
    "with watermark, complete mode (SURVEY.md §7 stage 5 — the reference "
    "has no streaming surface, §2.11).",
)
def streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_hourly_counts(spark, sf_dir)


@register(
    "streaming_user_totals",
    """
    WITH ranked AS (
      SELECT user_id, value, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id,
           COUNT(*) AS n_events,
           round(SUM(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0, 4) AS total_value,
           MAX(CASE WHEN rn = 1 THEN event_type END) AS last_event
    FROM ranked GROUP BY user_id
    """,
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "per-user running totals with exact integer state; final emission "
    "equals the batch aggregate.",
)
def streaming_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_user_running_totals(spark, sf_dir)


from qa_data_pipeline_rag_llm_spark.streaming.events import (  # noqa: E402
    stream_dedup_rate_limited,
    stream_session_windows,
    stream_sliding_counts,
    stream_static_enriched,
)


@register(
    "streaming_sliding_counts",
    """
    WITH e AS (
      SELECT event_type, value,
             (epoch_us(ts) // 1800000000) * 1800000000 AS s1
      FROM events
    ), expanded AS (
      SELECT event_type, value, s1 AS s FROM e
      UNION ALL
      SELECT event_type, value, s1 - 1800000000 AS s FROM e
    )
    SELECT strftime(make_timestamp(s), '%Y-%m-%d %H:%M') AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS DOUBLE) AS total_value
    FROM expanded GROUP BY 1, 2
    """,
    doc="Sliding event-time window (1 h / 30 min slide): every event lands "
    "in exactly two windows; oracle expands each row into both window "
    "starts. Windows align to the epoch, matching F.window's alignment.",
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_sliding_counts(spark, sf_dir)


@register(
    "streaming_session_windows",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  >= 1800000000 THEN 1 ELSE 0 END AS brk
      FROM events
    ), s AS (
      SELECT user_id, ts, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
           COUNT(*) AS n_events,
           CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, sid
    """,
    doc="Native session windows (session_window, 30 min gap) per user — "
    "the streaming twin of batch sessionization. Spark merges an event "
    "into a session iff it falls strictly inside [start, last+gap), so "
    "the oracle breaks sessions on diff >= gap.",
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_session_windows(spark, sf_dir)


@register(
    "streaming_session_windows_watermarked",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  >= 1800000000 THEN 1 ELSE 0 END AS brk
      FROM events
    ), s AS (
      SELECT user_id, ts, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    ), m AS (
      SELECT (epoch_us(MAX(ts)) // 1000) * 1000 - 3600000000 AS wm_us
      FROM events
    ), sess AS (
      SELECT user_id,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
             epoch_us(MAX(ts)) + 1800000000 AS send_us,
             COUNT(*) AS n_events,
             CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                  AS DOUBLE) AS total_value
      FROM s GROUP BY user_id, sid
    )
    SELECT user_id, sess_start, n_events, total_value
    FROM sess, m WHERE send_us <= wm_us
    """,
    doc="The PRODUCTION session-window shape: watermarked (1 h) append "
    "mode — a session emits and its state EVICTS once the watermark "
    "passes its end, so state holds open sessions only (the complete-"
    "mode twin keeps every session; tools/streaming_probe.py measures "
    "the state delta). Deterministic under the single-batch drain: the "
    "final no-data batch pins the watermark at ms-floored max(ts) − "
    "delay, making the emitted set exactly the sessions with last_ts + "
    "gap <= watermark — the oracle's WHERE clause.",
)
def streaming_session_windows_watermarked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        stream_session_windows_watermarked,
    )

    return stream_session_windows_watermarked(spark, sf_dir)


@register(
    "streaming_dedup_events",
    """
    SELECT event_type, COUNT(*) AS n_kept FROM (
      SELECT DISTINCT user_id, event_type, date_trunc('minute', ts) AS m
      FROM events
    ) GROUP BY event_type
    """,
    doc="Streaming dropDuplicates state operator: at most one event per "
    "(user, type, minute). The surviving physical row is nondeterministic, "
    "so the checked output counts surviving KEYS only.",
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_dedup_rate_limited(spark, sf_dir)


@register(
    "streaming_static_join",
    """
    WITH seg AS (
      SELECT user_id,
             CASE WHEN COUNT(*) >= 70 THEN 'heavy' ELSE 'light' END AS segment
      FROM events GROUP BY user_id
    )
    SELECT s.segment, e.event_type, COUNT(*) AS n,
           CAST(ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE), 4) AS DOUBLE) AS total_value
    FROM events e JOIN seg s USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Stream-static join: the event stream joins a batch-computed user "
    "segment dimension (re-planned per micro-batch, stateless), then a "
    "windowless streaming agg per (segment, event_type).",
)
def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_static_enriched(spark, sf_dir)


def _near_dup_gate_sql() -> str:
    """Batch replay of stream_near_dup_gate: both sides' affine MinHash
    signatures + band keys come from queries_text.minhash_side_sql (the
    shared layout), then the LEFT-join hit count."""
    from qa_data_pipeline_rag_llm_spark.plans.queries_text import (
        minhash_side_sql,
    )

    return f"""
    WITH {minhash_side_sql("s", "doc_id % 2 = 1")},{minhash_side_sql("h", "doc_id % 2 = 0")}
    SELECT s.doc AS doc_id,
           CAST(SUM(CASE WHEN h.doc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_band_hits,
           SUM(CASE WHEN h.doc IS NOT NULL THEN 1 ELSE 0 END) = 0 AS is_new
    FROM bands_s s LEFT JOIN bands_h h
      ON s.band_id = h.band_id AND s.band_key = h.band_key
    GROUP BY s.doc
    """


@register(
    "streaming_near_dup_gate",
    _near_dup_gate_sql(),
    doc="Streaming curation admission control: incoming docs are MinHash-"
    "banded MAP-ONLY (the array_min signature needs no shuffle, so it "
    "is legal mid-stream) and LEFT-joined against the static historical "
    "band table; the per-doc hit count is the only stateful op. is_new "
    "docs are safe to admit — the streaming twin of "
    "incremental_dedup_new_batch (streaming/events.py:"
    "stream_near_dup_gate).",
)
def streaming_near_dup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        stream_near_dup_gate,
    )

    return stream_near_dup_gate(spark, sf_dir)


def _quality_gate_sql() -> str:
    # imported for its registration side effect: queries_curation sits
    # AFTER this module in queries.py's import order, so pull it in now
    # (idempotent — Python caches the module) to compose its oracle
    from qa_data_pipeline_rag_llm_spark.plans import queries_curation  # noqa: F401
    from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY

    return (
        "SELECT * FROM ("
        + REGISTRY["gopher_quality_documents"].oracle
        + ") WHERE doc_id % 2 = 1"
    )


@register(
    "streaming_quality_gate",
    _quality_gate_sql(),
    doc="Streaming Gopher-rule admission control: the hard-rule verdict "
    "is a pure per-row projection (no shuffle, no state), applied "
    "mid-stream in append mode — one verdict row per incoming doc. "
    "Together with streaming_near_dup_gate this is the full streaming "
    "curation pipeline in the batch gate order: rules first "
    "(stateless), then the near-dup band lookup (stream-static join). "
    "Oracle: the batch gopher verdict restricted to the stream subset "
    "(streaming/events.py:stream_quality_gate).",
)
def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        stream_quality_gate,
    )

    return stream_quality_gate(spark, sf_dir)


def _scd2_closed_sql() -> str:
    # the batch SCD2 oracle lives in the leaf fragments module — NOT in
    # queries_temporal: importing that here ran at register time while
    # queries_temporal could itself be mid-import (circular-import
    # crash when it was the first plans module loaded — review r03)
    from qa_data_pipeline_rag_llm_spark.plans.oracle_fragments import (
        O_SCD2_FULL,
    )

    return (
        "SELECT user_id, version, state, valid_from_us, valid_to_us "
        "FROM (" + O_SCD2_FULL + ") WHERE NOT is_current"
    )


@register(
    "streaming_scd2_closed_versions",
    _scd2_closed_sql(),
    doc="Streaming SCD2 maintenance (applyInPandasWithState): a user's "
    "state version is emitted the moment its successor run begins, so "
    "append-mode output is a stream of immutable closed-version facts — "
    "correct under ANY micro-batching, because an open version is "
    "simply not final until it closes (it lives in the group state). "
    "Oracle: the batch SCD2 build restricted to NOT is_current — the "
    "streaming path and the batch kernel must agree row for row "
    "(streaming/events.py:stream_scd2_closed_versions).",
)
def streaming_scd2_closed_versions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        stream_scd2_closed_versions,
    )

    return stream_scd2_closed_versions(spark, sf_dir)


@register(
    "streaming_backfill_bounded",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS DOUBLE)
             AS total_value,
           TRUE AS multi_batch
    FROM events GROUP BY event_type
    """,
    doc="Bounded-batch backfill (Trigger.AvailableNow + maxFilesPerTrigger): "
    "replays the archive as a SEQUENCE of executor-sized micro-batches with "
    "checkpointed progress instead of one giant batch — the kill/resume-safe "
    "way to push a 100 TB file archive through a streaming pipeline. "
    "multi_batch is the driver-hashable verdict that the bound actually "
    "split the run (>1 micro-batch); totals are exact decimal sums, "
    "batch-order-independent.",
)
def streaming_backfill_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        stream_backfill_bounded,
    )

    return stream_backfill_bounded(spark, sf_dir)
