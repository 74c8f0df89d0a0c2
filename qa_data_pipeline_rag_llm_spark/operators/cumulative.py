"""Distributed global rank + running sum (two-pass partition-offset).

A ``Window.orderBy(...)`` with no ``partitionBy`` pushes the whole frame
through ONE task — fine for a pre-aggregated bounded frame, a scale
killer when the frame grows with the data (VERDICT r02 #1: the Pareto
per-user frame and the vocabulary-coverage token-type frame both do).

The classic fix is the two-pass partition-offset pattern (the same shape
MapReduce "total order" sorts and Flink's range-partitioned rank use):

1. ``repartitionByRange`` on the sort key → partition *i* holds a
   contiguous key range, partitions ordered by the sort order.
2. Within each partition, a window PARTITIONED by the physical partition
   id computes a local ``row_number`` and local running sum — P parallel
   tasks, no global sort task.
3. A per-partition summary (count, sum) — P rows — gets its own
   cumulative offsets via a window over those P rows (bounded by the
   partition count, not the data), and is broadcast-joined back.

``global rank = local rank + rows in earlier partitions``;
``running sum = local running sum + sum of earlier partitions``.

Correctness subtlety: ``spark_partition_id()`` is only meaningful
relative to the range partitioning, so the frame is materialized through
the exchange before the id is read; the order columns must form a total
order (callers pass a unique tie-break column) so results are
deterministic and oracle-hashable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__cum_pid"
_LRANK = "__cum_lrank"
_LSUM = "__cum_lsum"
_OFF_ROWS = "__cum_off_rows"
_OFF_SUM = "__cum_off_sum"


def rank_cumsum(
    df: DataFrame,
    order_by: Sequence[Column],
    value_col: str,
    rank_col: str = "rank",
    cumsum_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a global ``row_number`` (``rank_col``) and running sum of
    ``value_col`` (``cumsum_col``) ordered by ``order_by``, without a
    single-task global window.

    ``order_by`` must totally order the frame (include a unique
    tie-break). ``num_partitions`` defaults to the session shuffle
    partition count.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    parts = df.repartitionByRange(num_partitions, *order_by).withColumn(
        _PID, F.spark_partition_id()
    )
    w_local = Window.partitionBy(_PID).orderBy(*order_by)
    w_cum = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = parts.select(
        "*",
        F.row_number().over(w_local).alias(_LRANK),
        F.sum(value_col).over(w_cum).alias(_LSUM),
    )
    # P-row summary frame: cumulative offsets over partition ids. The
    # window here is global but bounded by the partition count.
    psum = local.groupBy(_PID).agg(
        F.count("*").alias("_rows"), F.sum(value_col).alias("_sum")
    )
    w_off = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = psum.select(
        _PID,
        F.coalesce(F.sum("_rows").over(w_off), F.lit(0)).alias(_OFF_ROWS),
        F.coalesce(F.sum("_sum").over(w_off), F.lit(0)).alias(_OFF_SUM),
    )
    out = local.join(F.broadcast(offsets), _PID)
    return (
        out.withColumn(rank_col, (F.col(_LRANK) + F.col(_OFF_ROWS)))
        .withColumn(cumsum_col, F.col(_LSUM) + F.col(_OFF_SUM))
        .drop(_PID, _LRANK, _LSUM, _OFF_ROWS, _OFF_SUM)
    )
