"""Sketch estimates vs exact answers, with error budgets (no SQL oracle:
HLL/KLL outputs are implementation-defined — see queries_udtf_sketch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
from tests.conftest import SF_DIR


def test_sketch_verdict_all_green(spark, tables):
    rows = REGISTRY["sketch_stats_events"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert (
            r["approx_users_ok"]
            and r["hll_users_ok"]
            and r["p50_ok"]
            and r["p95_ok"]
        ), r


def test_sketch_estimates_within_budget(spark, tables):
    from qa_data_pipeline_rag_llm_spark.plans.queries_udtf_sketch import (
        _sketch_stats_raw,
    )

    got = {
        r["event_type"]: r for r in _sketch_stats_raw(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r
        for r in tables["events"]
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, e in exact.items():
        g = got[et]
        # HLL (lgK=12) standard error ~1.6%; allow 5% for both estimators.
        assert abs(g["approx_users"] - e["users"]) <= max(2, 0.05 * e["users"])
        assert abs(g["hll_users"] - e["users"]) <= max(2, 0.05 * e["users"])
        # 10k-accuracy percentile_approx: rank error 1/10000 of the group.
        for q in ("p50", "p95"):
            assert abs(g[q] - e[q]) <= max(0.05 * abs(e[q]), 0.5)


def test_hll_sketches_merge_exactly(spark, tables):
    """Mergeability — the property that makes sketches the 100 TB path:
    per-day HLL sketches unioned with hll_union_agg give the IDENTICAL
    estimate as one global sketch (deterministic binary, not just close).
    A planet-scale rollup can therefore maintain daily sketches and
    answer any date-range cardinality by merging."""
    ev = tables["events"]
    global_est = (
        ev.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
        ).collect()[0]["est"]
    )
    merged_est = (
        ev.groupBy(F.dayofmonth("ts").alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert merged_est == global_est
