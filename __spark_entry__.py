"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All three functions delegate to the engine's query registry
(``qa_data_pipeline_rag_llm_spark/plans/queries.py``) — the single source
of truth also consumed by tests/ and bench.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from qa_data_pipeline_rag_llm_spark.catalog import enable_table_persist  # noqa: E402
from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    corpus_prep_pipeline is the engine's reason to exist: quality gate →
    dedup → chunking → stats, one declarative plan (queries_corpus.py).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return REGISTRY["corpus_prep_pipeline"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # defensive: the driver may hand us a session built without the
            # engine's session factory; pin the correctness-critical confs.
            # Arrow included: it changes toPandas array-column representation
            # (numpy arrays, matching DuckDB's) as well as transfer speed.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
            # The driver sweep runs the whole registry over the same ten
            # tables in one session: persist the shared scans once instead
            # of re-reading parquet ~150 times (catalog.py cache note).
            enable_table_persist(True)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(spec.spark) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle
    }
