"""True TPC-H partsupp shapes over the synthesized twin (VERDICT r09 #8).

The driver's testdata has no partsupp, so the registry carries
structural substitutes (COVERAGE.md TPC-H note). Here the local twin
lights up the REAL q2/q11/q16/q20 four-table shapes: generate partsupp
once per module, register it (plus the shipped tables) as DuckDB views,
and golden-check each Spark plan against the ANSI oracle — q2 keeps the
spec's correlated scalar subquery in SQL while the Spark side runs the
decorrelated window form, so the decorrelation itself is what's tested.
"""

from __future__ import annotations

import tempfile

import duckdb
import pytest

from qa_data_pipeline_rag_llm_spark.plans import partsupp_shapes as pss
from tests.conftest import SF_DIR, assert_oracle_match


@pytest.fixture(scope="module")
def partsupp(spark):
    """Generated twin, round-tripped through parquet so BOTH engines
    read the identical table."""
    tmp = tempfile.mkdtemp(prefix="partsupp")
    path = f"{tmp}/partsupp.parquet"
    pss.synth_partsupp(spark, SF_DIR).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path), path


@pytest.fixture(scope="module")
def duck_ps(partsupp):
    _, path = partsupp
    con = duckdb.connect()
    for t in ("part", "supplier", "nation", "region", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    con.execute(
        f"CREATE VIEW partsupp AS SELECT * FROM '{path}/*.parquet'"
    )
    return con


def test_synth_partsupp_shape(spark, partsupp, duck_ps):
    ps, _ = partsupp
    n_part = duck_ps.execute("SELECT COUNT(*) FROM part").fetchone()[0]
    rows = duck_ps.execute(
        """SELECT COUNT(*), COUNT(DISTINCT (ps_partkey, ps_suppkey)),
                  MIN(ps_availqty), MIN(ps_supplycost)
           FROM partsupp"""
    ).fetchone()
    assert rows[0] == n_part * pss.PS_PER_PART
    assert rows[1] == rows[0]  # (part, supp) is a key
    assert rows[2] >= 1 and float(rows[3]) >= 1.0
    # every supplier key is real
    orphan = duck_ps.execute(
        """SELECT COUNT(*) FROM partsupp
           WHERE ps_suppkey NOT IN (SELECT s_suppkey FROM supplier)"""
    ).fetchone()[0]
    assert orphan == 0


def test_q2_true_min_cost_supplier(spark, partsupp, duck_ps):
    ps, _ = partsupp
    got = pss.q2_true(spark, SF_DIR, ps)
    assert_oracle_match(got, duck_ps.execute(pss.q2_true_sql()), "q2_true")


def test_q11_true_important_stock(spark, partsupp, duck_ps):
    ps, _ = partsupp
    nation = duck_ps.execute(
        """SELECT MIN(n_name) FROM nation
           WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)"""
    ).fetchone()[0]  # a nation that actually HAS suppliers
    got = pss.q11_true(spark, SF_DIR, ps, nation, fraction=0.01)
    assert_oracle_match(
        got, duck_ps.execute(pss.q11_true_sql(nation, fraction=0.01)),
        "q11_true",
    )
    assert got.count() > 0  # the threshold keeps something


def test_q16_true_supplier_relationship(spark, partsupp, duck_ps):
    ps, _ = partsupp
    got = pss.q16_true(spark, SF_DIR, ps)
    assert_oracle_match(got, duck_ps.execute(pss.Q16_TRUE_SQL), "q16_true")


def test_q20_true_potential_promotion(spark, partsupp, duck_ps):
    ps, _ = partsupp
    got = pss.q20_true(spark, SF_DIR, ps)
    assert_oracle_match(
        got, duck_ps.execute(pss.q20_true_sql()), "q20_true"
    )
