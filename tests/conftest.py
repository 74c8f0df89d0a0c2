"""Shared fixtures: one local SparkSession + a DuckDB oracle comparator.

The comparator mirrors the driver's correctness gate (row count, schema,
order-insensitive value hash — see __spark_entry__.py docstring): columns
sorted by name, rows sorted, values compared EXACTLY (floats must be
bit-identical, because a hash compare gives no tolerance).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from qa_data_pipeline_rag_llm_spark.catalog import load_all
from qa_data_pipeline_rag_llm_spark.schemas import TESTDATA_TABLES
from qa_data_pipeline_rag_llm_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def http_listen_addr(name: str) -> tuple[str, str]:
    """(addr_spec, base_url) for a local test HTTP endpoint: a TCP port
    when the sandbox allows AF_INET binds, else an AF_UNIX socket path
    carrying the same HTTP bytes (``functions/unixhttp.py``) — so the
    live-transport tests run EVERYWHERE instead of skipping where
    loopback binds are forbidden (VERDICT r09 #1).
    SPARK_GRAFT_FORCE_UNIX_HTTP=1 pins the unix transport for local
    rehearsal of the no-AF_INET environment."""
    import socket
    import tempfile

    from qa_data_pipeline_rag_llm_spark.functions.unixhttp import unix_url

    if os.environ.get("SPARK_GRAFT_FORCE_UNIX_HTTP") != "1":
        try:
            with socket.socket() as s:
                s.bind(("127.0.0.1", 0))
                port = s.getsockname()[1]
            return str(port), f"http://127.0.0.1:{port}"
        except OSError:
            pass
    sock = os.path.join(tempfile.mkdtemp(prefix="qa_http_"), name + ".sock")
    return sock, unix_url(sock)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    return load_all(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, stringify every cell deterministically, sort rows."""
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        out[c] = out[c].map(_cell)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def _cell(v) -> str:
    import numpy as np

    if isinstance(v, np.ndarray):  # DuckDB and Arrow-less Spark disagree on
        v = v.tolist()  # list representation — canonicalize to Python lists
    if isinstance(v, list):
        return str([_cell(x) for x in v])
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "∅"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def assert_oracle_match(spark_df, duck_relation, name: str = "query"):
    """Assert the Spark result and the DuckDB result are value-identical."""
    left = canonicalize(spark_df.toPandas())
    right = canonicalize(duck_relation.df())
    assert list(left.columns) == list(right.columns), (
        f"{name}: schema mismatch\n spark={list(left.columns)}\n duck ={list(right.columns)}"
    )
    assert len(left) == len(right), (
        f"{name}: row count {len(left)} (spark) != {len(right)} (duck)"
    )
    if not left.equals(right):
        diff_mask = (left != right).any(axis=1)
        sample = pd.concat(
            {"spark": left[diff_mask].head(5), "duck": right[diff_mask].head(5)},
            axis=1,
        )
        raise AssertionError(
            f"{name}: value mismatch on {int(diff_mask.sum())}/{len(left)} rows\n{sample}"
        )
