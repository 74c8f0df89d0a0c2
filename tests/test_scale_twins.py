"""Scale-variant twins vs their exact forms (VERDICT r02 #7).

decile_stats_approx and pack_documents_sharded trade total-order windows
for fully-parallel shapes; these pin the invariants that must survive
the trade and the exact-equality cases where the semantics coincide.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
from tests.conftest import SF_DIR


def test_decile_twin_partitions_all_rows(spark, tables):
    rows = REGISTRY["decile_stats_approx"].spark(spark, SF_DIR).collect()
    by_d = {r.decile: r for r in rows}
    assert set(by_d) == set(range(1, 11))
    assert sum(r.n_rows for r in rows) == tables["lineitem"].count()
    # value ranges are disjoint and ordered
    for d in range(1, 10):
        assert by_d[d].max_price <= by_d[d + 1].min_price


def test_decile_twin_agrees_with_ntile_up_to_ties(spark, tables):
    """Value-level deciles differ from ntile only where a tie group
    straddles a boundary — per-decile counts deviate by at most the
    largest tie-group size, and money totals agree globally."""
    exact = {
        r.decile: r
        for r in REGISTRY["decile_stats_lineitem"].spark(spark, SF_DIR).collect()
    }
    twin = {
        r.decile: r
        for r in REGISTRY["decile_stats_approx"].spark(spark, SF_DIR).collect()
    }
    max_tie = (
        tables["lineitem"]
        .groupBy("l_extendedprice")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    for d in range(1, 11):
        assert abs(twin[d].n_rows - exact[d].n) <= max_tie
    # sum in integer cents: each total is already rounded to 2 dp, but
    # double addition order differs between the two frames — exact float
    # == on the sums is 1-ulp flake-prone (review r03)
    assert sum(round(t.total * 100) for t in twin.values()) == (
        sum(round(e.total * 100) for e in exact.values())
    )


def test_decile_twin_has_no_single_task_sort(spark):
    df = REGISTRY["decile_stats_approx"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__cum_bid" in plan  # the distributed cumsum
    for line in plan.splitlines():
        if "Window" in line and "__cum_bid" not in line:
            raise AssertionError(f"unpartitioned window: {line}")


def test_pack_sharded_preserves_corpus_totals(spark):
    exact = REGISTRY["pack_documents_blocks"].spark(spark, SF_DIR).collect()
    sharded = REGISTRY["pack_documents_sharded"].spark(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in sharded) == sum(r.n_docs for r in exact)
    assert sum(r.block_tokens for r in sharded) == sum(
        r.block_tokens for r in exact
    )


def test_pack_sharded_one_shard_is_the_exact_form(spark):
    from qa_data_pipeline_rag_llm_spark.plans.queries_packing import (
        pack_documents_sharded,
    )

    exact = sorted(
        map(tuple, REGISTRY["pack_documents_blocks"].spark(spark, SF_DIR).collect())
    )
    one = sorted(
        map(tuple, pack_documents_sharded(spark, SF_DIR, shards=1).collect())
    )
    assert one == exact


def test_pack_sharded_window_is_partitioned(spark):
    df = REGISTRY["pack_documents_sharded"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(shard" in plan
    # no global-order exchange anywhere in the sharded path
    assert "rangepartitioning" not in plan.lower()
    assert "TakeOrderedAndProject" not in plan
