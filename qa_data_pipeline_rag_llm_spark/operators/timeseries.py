"""Time-series regularization: gap filling + forward fill.

Event streams are sparse; models and dashboards want dense regular
grids. ``gapfill_daily`` builds each key's daily spine with
``sequence(min_day, max_day)`` + explode — per-key, so one long-lived
user doesn't force a global grid — left-joins the observed aggregates,
zero-fills the measures, and forward-fills categorical state with
``last(..., ignorenulls=True)`` over an ordered window. One shuffle for
the aggregate, one for the window; the spine explode is narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_daily(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(key, day, n, cum_n, ff_type): dense daily grid per key between
    that key's first and last active day; n zero-filled, cum_n the
    running total, ff_type the forward-filled deterministic last event
    type of the most recent active day (ties broken by (ts, id))."""
    day = F.date_trunc("day", ts_col)
    base = events.select(key, day.alias("day"), ts_col, id_col, type_col)
    daily = base.groupBy(key, "day").agg(
        F.count("*").alias("n"),
        # lexicographic struct max = deterministic "last of the day"
        F.max(F.struct(ts_col, id_col, type_col))[type_col].alias("day_type"),
    )
    bounds = base.groupBy(key).agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        key,
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    j = spine.join(daily, [key, "day"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        key,
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n", F.lit(0)).alias("n"),
        F.sum(F.coalesce("n", F.lit(0))).over(w).alias("cum_n"),
        F.last("day_type", ignorenulls=True).over(w).alias("ff_type"),
    )
