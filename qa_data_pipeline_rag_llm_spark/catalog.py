"""Table catalog: schema-checked Parquet loads + temp-view registration.

Replaces the reference's files-as-IR convention (each stage re-reads the
previous stage's CSV with inferSchema — SURVEY.md §3) with one load point
that applies the explicit schemas from :mod:`schemas` and registers SQL
views, so the DataFrame and SQL surfaces share one set of plans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, TimestampNTZType

from qa_data_pipeline_rag_llm_spark.schemas import TESTDATA_SCHEMAS, TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# ---------------------------------------------------------------------------
# Multi-query session cache.
#
# A driver correctness sweep runs ~150 registry queries over the same ten
# tables in one session; re-building the reader per query re-pays analysis
# and (for events) a parquet-footer probe, and re-scans parquet per query.
# `load_table` therefore memoizes the DataFrame per (application, sf_dir,
# table). Persisting the memoized frames (`enable_table_persist`) is OPT-IN:
# it swaps parquet scans for InMemoryTableScan, which deliberately bypasses
# pushdown/pruning — right for a 150-query sweep over sf0.01, wrong for
# plan-quality tests and for honest scan benchmarks, so tests and bench.py
# leave it off. Only __spark_entry__ (the driver's sweep surface) turns it
# on. Scale note: this caches *source tables* at correctness SF (MBs); at
# 100 TB the flag simply stays off and every plan reads parquet.
# ---------------------------------------------------------------------------

_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_PERSIST = False


def enable_table_persist(flag: bool = True) -> None:
    """Persist memoized tables (MEMORY_AND_DISK) for multi-query sessions.

    Applies retroactively to frames already memoized — the driver runs
    ``entry()`` (which loads tables) BEFORE flipping this on for the
    query sweep, and those early loads must not stay unpersisted for the
    whole ~190-query session."""
    global _PERSIST
    _PERSIST = flag
    for df in _DF_CACHE.values():
        try:
            # frames keyed to a previous, now-stopped SparkSession would
            # raise through py4j; skip them instead of failing the sweep
            # (review r03) — clear_table_cache is the real cleanup hook
            if flag:
                df.persist()
            else:
                df.unpersist()
        except Exception:
            pass


def clear_table_cache() -> None:
    """Unpersist and forget every memoized table (test isolation hook)."""
    for df in _DF_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _DF_CACHE.clear()


def events_read_schema(spark: SparkSession, path: str) -> StructType:
    """Read schema for the events table with ``ts`` as it physically arrives.

    The driver's parquet has shipped ``ts`` both as TIMESTAMP(NANOS) (which
    the session's ``nanosAsLong`` conf surfaces as int64 ns) and as plain
    µs TIMESTAMP (surfaced as TIMESTAMP_NTZ). Probe the footer (metadata
    only, no data scan) instead of hardcoding either generation.
    """
    probed = spark.read.parquet(path).schema["ts"].dataType
    return StructType(
        [
            f if f.name != "ts" else StructField("ts", probed, f.nullable)
            for f in TESTDATA_SCHEMAS["events"]
        ]
    )


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Bring ``ts`` to session-zoned TimestampType (µs) whatever it arrived as."""
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        # int64 epoch-ns → µs with integer division — ns epochs exceed
        # double's 2^53, so `div`, never `/`. Floor matches DuckDB epoch_us.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampNTZType):
        # wall-clock-preserving under the pinned UTC session timezone
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its declared schema.

    The schema is passed to the reader (not asserted post-hoc) so the scan
    never pays an inference pass and column pruning works from the plan root.
    """
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TESTDATA_SCHEMAS)}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        raw = spark.read.schema(events_read_schema(spark, path)).parquet(path)
        df = normalize_events_ts(raw)
    else:
        df = spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(path)
    if _PERSIST:
        df = df.persist()
    _DF_CACHE[key] = df
    return df


def load_all(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load every testdata table; optionally register each as a temp view."""
    tables = {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}
    if register_views:
        for name, df in tables.items():
            df.createOrReplaceTempView(name)
    return tables
