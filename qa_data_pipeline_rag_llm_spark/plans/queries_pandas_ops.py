"""Registry entries: batch grouped-map / cogrouped-map pandas operators.

These exercise the two Python-execution shapes the rest of the registry
doesn't (operators/grouped.py): per-group model fitting via
``applyInPandas`` and two-sided per-key reconciliation via
``cogroup().applyInPandas``. Both stay oracle-checkable because the
imperative code computes closed-form statistics with exact integer sums
and mirrors the SQL's final double expression exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.operators.grouped import (
    fit_value_trend_per_user,
    reconcile_clicks_purchases,
    user_value_micro_totals,
)
from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register


@register(
    "trend_per_user_events",
    """
    WITH base AS (
      SELECT user_id,
             (epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id))
               // 1000000 AS t,
             CAST(round(value * 1000000) AS BIGINT) AS v
      FROM events
    ), s AS (
      SELECT user_id, COUNT(*) AS n, SUM(t) AS sx, SUM(v) AS sy,
             SUM(t * v) AS sxy, SUM(t * t) AS sxx
      FROM base GROUP BY user_id)
    SELECT user_id, n,
           CASE WHEN n >= 2 AND CAST(n * sxx - sx * sx AS DOUBLE) <> 0.0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE)
                           / 1000000.0 * 86400.0, 6)
                ELSE NULL END AS slope_per_day
    FROM s
    """,
    doc="Per-user OLS trend (value per day) fit inside a grouped-map "
    "applyInPandas — the 'train a tiny model per group' shape. One "
    "shuffle on user_id; each group streams through the Python worker as "
    "Arrow batches. The pandas code accumulates exact integer sums and "
    "evaluates the identical closed-form double expression as the SQL "
    "oracle, so floats match bit-for-bit.",
)
def trend_per_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fit_value_trend_per_user(_t(spark, sf_dir, "events"))


@register(
    "cogroup_reconcile_events",
    """
    WITH c AS (
      SELECT user_id, COUNT(*) AS n_clicks,
             MIN(epoch_us(ts)) AS first_click_us
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ), p AS (
      SELECT user_id, COUNT(*) AS n_purchases,
             MIN(epoch_us(ts)) AS first_purchase_us
      FROM events WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           COALESCE(n_clicks, 0) AS n_clicks,
           COALESCE(n_purchases, 0) AS n_purchases,
           first_click_us, first_purchase_us,
           (first_click_us IS NOT NULL AND first_purchase_us IS NOT NULL
            AND first_click_us <= first_purchase_us) AS converted
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    """,
    doc="Click/purchase reconciliation via cogroup().applyInPandas: both "
    "sides arrive pre-grouped per user in one Python call — the two-"
    "sided custom-merge shape (think CDC diffing, order/payment "
    "matching) that would otherwise need a full outer join plus "
    "re-grouping. Emits one row per user present on either side.",
)
def cogroup_reconcile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return reconcile_clicks_purchases(clicks, purchases)


@register(
    "pandas_udaf_user_totals",
    """
    SELECT user_id,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
             AS value_micro
    FROM events GROUP BY user_id
    """,
    doc="Grouped-agg pandas UDAF (completing the UDF-flavor matrix next "
    "to scalar/iterator pandas_udfs, applyInPandas, cogroup, mapInPandas, "
    "mapInArrow, and the UDTF): exact micro-scaled integer sum per user — "
    "int64 arithmetic makes the custom aggregate order-independent across "
    "partitions, which is the admission test for ANY distributed UDAF.",
)
def pandas_udaf_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_value_micro_totals(_t(spark, sf_dir, "events"))
