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
