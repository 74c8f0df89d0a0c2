"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the input
    has too few partitions.

    Single-file/single-row-group parquet scans plan as ONE task, which
    serializes CPU-heavy per-row work (hashing, shingling, UDFs) onto one
    core. At real scale the scan already has ≥ cores splits and this is a
    no-op — the shuffle is only paid when the input couldn't parallelize
    anyway.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, int(target * min_fraction)):
        return df.repartition(target)
    return df
