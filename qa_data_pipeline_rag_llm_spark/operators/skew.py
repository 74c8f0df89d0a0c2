"""Skew-resilient shuffle patterns: salted aggregation and salted join.

At 100 TB a handful of hot keys (a viral post's comments, one dominant
event_type) can pin an entire stage on one reducer. Two standing
mitigations, both *semantically transparent* (oracle-checked to equal
the unsalted plan):

  * ``salted_aggregate`` — two-stage agg: groupBy(key, salt) computes
    partial aggregates across ``n_salts`` reducers, then a cheap final
    groupBy(key) over ``n_salts × |keys|`` rows merges them. (Spark's
    hash-agg already does map-side partials; salting additionally splits
    the *reduce* side of a hot key across executors.)
  * ``replicate_dim_for_salted_join`` / ``salt_fact`` — skewed fact-dim
    equi-join: explode the dim side across all salt values, give each
    fact row a deterministic salt, join on (key, salt). Each hot key's
    rows spread over ``n_salts`` tasks. AQE's skew-join split
    (``spark.sql.adaptive.skewJoin``) does this adaptively for sort-merge
    joins; the explicit form covers broadcast-ineligible dims and engines
    where AQE can't see the skew (e.g. a hot key that is skewed only
    after a filter).

Aggregation functions must be decomposable (sum/count/min/max — avg as
sum+count); that is the caller's contract, as it is for any combiner.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(id_col: str | Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from a row-identifying column."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.xxhash64(col), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    group_by: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_from: str,
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage groupBy: (key, salt) partials → key-only merge."""
    partial = df.groupBy(
        *group_by, salt_column(salt_from, n_salts).alias("_salt")
    ).agg(*partial_aggs)
    return partial.groupBy(*group_by).agg(*final_aggs)


def replicate_dim_for_salted_join(dim: DataFrame, n_salts: int) -> DataFrame:
    """Cross the dim with every salt value (dim grows ×n_salts — keep it
    for genuinely small-but-unbroadcastable dims)."""
    return dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salt_fact(fact: DataFrame, id_col: str, n_salts: int) -> DataFrame:
    return fact.withColumn("_salt", salt_column(id_col, n_salts))
