"""Distributed global rank + running sum (two-pass bucket-offset).

A ``Window.orderBy(...)`` with no ``partitionBy`` pushes the whole frame
through ONE task — fine for a pre-aggregated bounded frame, a scale
killer when the frame grows with the data (VERDICT r02 #1: the Pareto
per-user frame and the vocabulary-coverage token-type frame both do).

The fix is the classic two-pass offset pattern, with one hard-won
subtlety: the buckets MUST be a pure function of the data, never of the
physical partition layout. A first cut used ``repartitionByRange`` +
``spark_partition_id()``; under AQE the two plan branches that read the
exchange (the local-window branch and the per-bucket-summary branch) can
get DIFFERENT coalesced shuffle reads, so the same row observes two
different partition ids and the offsets silently corrupt (caught by the
sf0.01 driver-emulation sweep — 11 "deciles" out of a 10-bucket query).

Data-derived design, no physical dependence anywhere:

1. One aggregate computes ~P approximate quantile boundaries of the
   bucket key (a one-row frame, broadcast; both branches share the same
   BroadcastExchange, and even a recompute is the same pure function).
2. ``bucket id = #boundaries strictly before the key`` — a projection of
   the row against the broadcast bounds array. Equal keys always land in
   the same bucket, and bucket id is monotone in the sort order, so
   buckets are contiguous key ranges.
3. A window PARTITIONED by bucket id computes local rank/running sum —
   ≤P parallel sorts, no single-task global sort.
4. The per-bucket summary (count, sum — ≤P rows) gets cumulative
   offsets via a window over bucket ids (bounded by P, not the data) and
   broadcast-joins back:
   ``global rank = local rank + rows in earlier buckets``;
   ``running sum = local running sum + sum of earlier buckets``.

The order columns must form a total order (callers pass a unique
tie-break) so results are deterministic and oracle-hashable. Skew note:
a single key with a huge tie mass (e.g. count=1 token types) collapses
into one bucket — the residual hot-bucket risk; pick a higher-resolution
bucket key if that bites.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BID = "__cum_bid"
_BOUNDS = "__cum_bounds"
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
    bucket_col: str | None = None,
    descending: bool = False,
    num_buckets: int | None = None,
) -> DataFrame:
    """Append a global ``row_number`` (``rank_col``) and running sum of
    ``value_col`` (``cumsum_col``) ordered by ``order_by``, without a
    single-task global window.

    ``order_by`` must totally order the frame (include a unique
    tie-break). ``bucket_col`` is the numeric column driving the range
    buckets — it must be the leading sort key — and ``descending`` its
    direction; ``num_buckets`` defaults to the session shuffle partition
    count.

    ``bucket_col`` must be NON-NULL (enforced with a per-row assert):
    every boundary comparison against a NULL key yields NULL → counted
    0, silently ranking NULL rows inside the FIRST bucket while the
    single-window reference sorts them by the session's null ordering —
    a value divergence, not a crash (advice r03). Callers with nullable
    keys must filter or coalesce first, choosing their null semantics
    explicitly.

    Thin wrapper over :func:`rank_cumsum_multi` with one value column
    (advice r07: the two bodies were ~60 duplicated lines carrying the
    subtle eager-boundary-collection logic — one place to fix now).
    """
    out = rank_cumsum_multi(
        df,
        order_by,
        [value_col],
        rank_col=rank_col,
        cumsum_prefix="__cum1_",
        bucket_col=bucket_col,
        descending=descending,
        num_buckets=num_buckets,
    )
    return out.withColumnRenamed(f"__cum1_{value_col}", cumsum_col)


def rank_cumsum_multi(
    df: DataFrame,
    order_by: Sequence[Column],
    value_cols: Sequence[str],
    rank_col: str = "rank",
    cumsum_prefix: str = "cum_",
    bucket_col: str | None = None,
    descending: bool = False,
    num_buckets: int | None = None,
) -> DataFrame:
    """``rank_cumsum`` for SEVERAL value columns in one pass: appends a
    global ``row_number`` (``rank_col``) and, for each name in
    ``value_cols``, its running sum as ``{cumsum_prefix}{name}`` — the
    shape a two-sample ECDF comparison needs (both groups' cumulative
    counts over one shared value ordering), at the cost of ONE bucketed
    sort instead of one per column.

    Same contract as ``rank_cumsum``: ``order_by`` must totally order
    the frame, ``bucket_col`` is the non-NULL leading numeric sort key
    (fail-loud assert), buckets derive from data-quantile boundaries
    only — never the physical partition layout."""
    if bucket_col is None:
        raise ValueError("bucket_col (the leading numeric sort key) is required")
    if not value_cols:
        raise ValueError("value_cols must name at least one column")
    if num_buckets is None:
        num_buckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    qs = [i / num_buckets for i in range(1, num_buckets)]
    # Bounds are collected ONCE driver-side (bounded: ≤ num_buckets-1
    # doubles — same class as the ivf centroid fetch) and inlined as
    # literals. Keeping them as a lazy broadcast branch would let the
    # local-window and bucket-summary consumers observe DIFFERENT bounds
    # if the exchange is ever recomputed instead of reused:
    # ApproximatePercentile's partial-sketch merge is fetch-order
    # dependent, and a boundary-adjacent key landing in bucket k on one
    # branch and k+1 on the other silently corrupts the offsets — the
    # same bug class as the rejected spark_partition_id design
    # (review r03). Cost: one extra evaluation of the input plan at
    # build time; the main job's two branches still share their scan
    # through exchange reuse.
    bvals = (
        df.agg(
            F.percentile_approx(
                F.col(bucket_col).cast("double"),
                F.array(*[F.lit(q) for q in qs]),
                F.lit(10_000),
            ).alias(_BOUNDS)
        ).collect()[0][0]
        or []
    )
    key = F.col(bucket_col).cast("double")
    before = (lambda b: b > key) if descending else (lambda b: b < key)
    # fail-loud NULL-key guard: assert_true passes (→ NULL → +0) on
    # every non-null key, throws with a diagnosable message otherwise
    bid = F.coalesce(
        F.assert_true(
            key.isNotNull(),
            F.lit(
                f"rank_cumsum_multi: bucket_col {bucket_col!r} must be non-null"
            ),
        ).cast("int"),
        F.lit(0),
    )
    for b in bvals:
        bid = bid + F.when(before(F.lit(float(b))), 1).otherwise(0)
    parts = df.withColumn(_BID, bid)
    w_local = Window.partitionBy(_BID).orderBy(*order_by)
    w_cum = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lsums = [f"{_LSUM}{i}" for i in range(len(value_cols))]
    local = parts.select(
        "*",
        F.row_number().over(w_local).alias(_LRANK),
        *[F.sum(v).over(w_cum).alias(ls) for v, ls in zip(value_cols, lsums)],
    )
    psum = parts.groupBy(_BID).agg(
        F.count("*").alias("_rows"),
        *[F.sum(v).alias(f"_sum{i}") for i, v in enumerate(value_cols)],
    )
    w_off = Window.orderBy(_BID).rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    osums = [f"{_OFF_SUM}{i}" for i in range(len(value_cols))]
    offsets = psum.select(
        _BID,
        F.coalesce(F.sum("_rows").over(w_off), F.lit(0)).alias(_OFF_ROWS),
        *[
            F.coalesce(F.sum(f"_sum{i}").over(w_off), F.lit(0)).alias(os)
            for i, os in enumerate(osums)
        ],
    )
    out = local.join(F.broadcast(offsets), _BID).withColumn(
        rank_col, F.col(_LRANK) + F.col(_OFF_ROWS)
    )
    for v, ls, os in zip(value_cols, lsums, osums):
        out = out.withColumn(f"{cumsum_prefix}{v}", F.col(ls) + F.col(os))
    return out.drop(_BID, _LRANK, _OFF_ROWS, *lsums, *osums)
