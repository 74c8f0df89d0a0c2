"""Distributed IO: Parquet/CSV writers + CSV source with explicit schemas.

Replaces the reference's two worst scale decisions (SURVEY.md §4):

  * K1 — every Spark stage collects to the driver and uploads one CSV
    (``/root/reference/PLATFORM-Merge.py:59-82`` et al., 7 sites). Here
    every sink is a distributed ``df.write`` — the driver never holds data.
  * S5 — every read re-infers schema from CSV (one extra full pass per
    file, ``REDDIT-Nettoyage-Posts.py:37-46``). Here CSV reads take an
    explicit schema and the reference's quoting dialect.

Scale notes: ``write_table`` partitions output by the given columns so
downstream scans prune; sort-within-partitions keeps row groups clustered
for min/max skipping. Arrays/structs stay native (Parquet), eliminating
the reference's CSV array-stringification + ``ast.literal_eval`` round-trip
(SURVEY.md §1.2 F6).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: The reference's CSV dialect (multiLine bodies, quote-escaped quotes —
#: REDDIT-Nettoyage-Posts.py:37-46).
CSV_OPTIONS = {
    "header": "true",
    "multiLine": "true",
    "quote": '"',
    "escape": '"',
}


def read_csv(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    """CSV scan with an explicit schema — single-pass, prunable."""
    opts = {**CSV_OPTIONS, **options}
    return spark.read.schema(schema).options(**opts).csv(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Distributed write; optional partition columns (partition pruning)
    and within-partition sort (row-group min/max skipping)."""
    out = df
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.options(**CSV_OPTIONS)
    writer.format(fmt).save(path)


def write_table_observed(
    df: DataFrame,
    path: str,
    metrics: dict[str, "object"] | None = None,
    **kwargs,
) -> dict[str, object]:
    """Distributed write that also returns pipeline metrics for the SAME
    pass over the data (``df.observe`` — no second scan, no collect).

    ``metrics`` maps names to aggregate Columns (e.g. row counts, null
    counts, sums); defaults to ``{"n_rows": count(*)}``. This is the
    audit hook a curation pipeline wants at every materialization point:
    the write and its data-quality counters cost one job, where the
    reference re-reads outputs to inspect them (SURVEY.md §3 files-as-IR).
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    write_table(observed, path, **kwargs)
    return obs.get


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_files: int,
    sort_by: Sequence[str] = (),
    fmt: str = "parquet",
) -> int:
    """Rewrite a many-small-files table into ``target_files`` outputs.

    The small-file problem is the silent killer of long-running pipelines
    (every micro-batch/task appends files; scans then pay per-file open +
    footer costs and lose row-group-sized reads). ``coalesce`` avoids a
    shuffle when reducing; an optional sort re-clusters row groups for
    min/max skipping. Writes to a NEW path (``dst``) — rewriting a table
    in place while reading it is never safe without a table format.
    Returns the row count (from the write pass via ``observe``).
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    df = spark.read.format(fmt).load(src).coalesce(target_files)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    observed.write.mode("overwrite").format(fmt).save(dst)
    return int(obs.get["n"])


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed managed table: pre-shuffles once at write time so every
    later equi-join/aggregation on the bucket keys is exchange-free.

    This is the 100 TB answer for fact-fact joins that repeat across a
    pipeline (e.g. orders⋈lineitem in q3/q4/q10/q12/q18/q21): pay the
    shuffle once, then N downstream joins read co-located buckets. Both
    sides must be bucketed by the join key into the same bucket count.
    Spark's Hive-style bucketing needs ``saveAsTable`` (path-based
    ``save`` silently drops bucket metadata). Pass ``path`` to keep the
    files in an explicit location (external table) instead of the
    session warehouse directory.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)
