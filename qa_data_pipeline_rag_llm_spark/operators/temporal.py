"""Temporal join operators: as-of join and windowed range self-join.

The reference has no temporal joins at all (SURVEY.md §2.4: one left
equi-join is its whole join repertoire), but a training-data pipeline over
event streams needs them constantly (nearest-prior-context lookup,
near-in-time pairing). Spark has no built-in AS OF join (Delta/other
engines bolt it on), so these are compositions of built-in operators
chosen for their shuffle shape at scale:

* ``asof_join`` — union-tag + carry-forward window. ONE shuffle on the
  join keys, no pair explosion, no range-join nested loop. This is the
  plan you want at 100 TB: both sides hash-partition by key, a single
  per-partition sort orders (ts, side), and ``last(..., ignorenulls)``
  carries the most recent right-side payload into each left row. A naive
  ``left.join(right, keys + [r.ts <= l.ts])`` degenerates to a broadcast
  nested-loop / cartesian per key and then needs a groupBy-max to pick
  the winner — two shuffles and an O(n·m) blowup.

* ``range_self_join_pairs`` — time-bucket blocking. Pairs within
  ``window`` are found by joining bucket b against buckets {b, b+1}
  (every qualifying pair co-occupies equal or adjacent buckets), then
  exact-filtering. Candidate count is bounded by per-bucket density, not
  per-key row count² — the classic band-join trick when the engine
  would otherwise nested-loop.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the payload of the most recent right row
    with ``right.ts <= left.ts`` (strictly ``<`` when ``inclusive=False``)
    within the same key group. Left rows with no prior right row keep NULLs.

    ``right`` must be unique per (keys, right_ts) — pre-aggregate ties
    (e.g. ``max_by``) so the result is deterministic.

    Plan shape: union both sides → one hash shuffle on ``keys`` → one
    per-partition sort on (ts, side) → running ``last(ignorenulls)``.
    """
    keys = list(keys)
    # side orders right before left at equal ts → inclusive match;
    # flip the order for exclusive semantics.
    l_side, r_side = (1, 0) if inclusive else (0, 1)
    payload = F.struct(*[F.col(c) for c in right_payload])
    left_cols = [c for c in left.columns if c not in keys and c != left_ts]

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__l"),
        F.lit(None).cast(
            right.select(payload.alias("__r")).schema["__r"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left_cols]).alias("__l"))
            .schema["__l"]
            .dataType
        ).alias("__l"),
        payload.alias("__r"),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == l_side)
    )
    return carried.select(
        *keys,
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l.{c}").alias(c) for c in left_cols],
        *[F.col(f"__match.{c}").alias(c) for c in right_payload],
    )


def range_self_join_pairs(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    id_col: str,
    window_us: int,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """All unordered pairs of rows sharing ``keys`` whose ``ts`` values lie
    within ``window_us`` microseconds, blocked through time buckets of the
    window width so no per-key cross product is materialized.

    Output: keys, ``<id_col>_a`` < ``<id_col>_b`` (canonical order),
    ``gap_us``, plus ``extra_cols`` from each side suffixed _a/_b.
    """
    keys = list(keys)
    us = F.unix_micros(F.col(ts))
    base = df.select(
        *keys,
        F.col(id_col).alias("__id"),
        us.alias("__us"),
        (us / F.lit(window_us)).cast("long").alias("__bucket"),
        *[F.col(c) for c in extra_cols],
    )
    probe = base.select(
        *[F.col(c).alias(f"{c}__b") for c in keys],
        F.col("__id").alias("__id_b"),
        F.col("__us").alias("__us_b"),
        F.explode(
            F.array(F.col("__bucket"), F.col("__bucket") + 1)
        ).alias("__jbucket"),
        *[F.col(c).alias(f"{c}__b") for c in extra_cols],
    )
    key_eq = [base[k] == probe[f"{k}__b"] for k in keys]
    cond = key_eq + [
        base["__bucket"] == probe["__jbucket"],
        base["__id"] != probe["__id_b"],
        F.abs(base["__us"] - probe["__us_b"]) <= window_us,
    ]
    joined = base.join(probe, _and(cond))
    lo_first = base["__id"] < probe["__id_b"]
    pick = lambda a, b: F.when(lo_first, a).otherwise(b)  # noqa: E731
    return joined.select(
        *[base[k] for k in keys],
        pick(base["__id"], probe["__id_b"]).alias(f"{id_col}_a"),
        pick(probe["__id_b"], base["__id"]).alias(f"{id_col}_b"),
        F.abs(base["__us"] - probe["__us_b"]).alias("gap_us"),
        *[pick(base[c], probe[f"{c}__b"]).alias(f"{c}_a") for c in extra_cols],
        *[pick(probe[f"{c}__b"], base[c]).alias(f"{c}_b") for c in extra_cols],
    ).distinct()


def _and(conds) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
