"""Table-maintenance family (plans/queries_maintenance.py): plan gates
and the partition-invariant Misra-Gries guarantees.

Correctness vs DuckDB is covered by test_oracle (all four queries are
oracled); these tests pin what the oracle cannot see — plan shapes and
the sketch bounds that must hold for EVERY partitioning.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.operators.freq import (
    _merge_counts,
    misra_gries_summaries,
)
from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
from qa_data_pipeline_rag_llm_spark.plans.queries_maintenance import MG_K
from tests.conftest import SF_DIR
from tests.test_plans import _final_plan, _plan


# ---------------------------------------------------------------- plans


def test_psi_reuses_grouped_exchange_single_scan(spark):
    """The side totals must be a re-aggregate of the SAME grouped frame
    (q11 pattern): one events scan, ReusedExchange, no second read."""
    plan = _final_plan(spark, "psi_drift_events")
    assert "ReusedExchange" in plan
    assert plan.count("events.parquet") <= 1


def test_compaction_plans_on_metadata_not_data(spark):
    """One orders scan; the global window runs AFTER the per-partition
    aggregate (on the stats frame), never on the fact table — the Sort
    for the window must sit above the HashAggregate, so the fact scan
    feeds an aggregate, not a sort."""
    plan = _plan(spark, "compaction_plan_orders")
    assert plan.count("orders.parquet") == 1
    assert "CartesianProduct" not in plan
    agg_pos = plan.find("HashAggregate")
    scan_pos = plan.find("FileScan")
    assert 0 <= agg_pos < scan_pos  # aggregate directly over the scan


def test_cdc_merge_is_union_window_no_join(spark):
    """MERGE resolves via one row_number over the unioned log — no join
    anywhere (the classic slow shape is base-left-join-changes per
    wave), and exactly one shuffle keyed on o_orderkey plus the final
    small rollup."""
    plan = _plan(spark, "cdc_versioned_merge_orders")
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning(o_orderkey") == 1


def test_heavy_hitters_summary_is_map_only(spark):
    """The MG summary stage must not shuffle the fact table: the only
    exchanges below the candidate aggregate are over the summary rows
    (metadata-sized). The exact-count audit arm shuffles, but the
    sketch arm is mapInPandas straight over the scan."""
    df = REGISTRY["heavy_hitters_events"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # sketch arm present and Arrow-batched, not row-at-a-time
    assert "mapInPandas" in plan or "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


# ------------------------------------------------- Misra-Gries kernel


def test_mg_merge_counts_offset_math():
    counters: dict = {}
    d1 = _merge_counts(counters, pd.Series({"a": 5, "b": 3, "c": 1}), k=2)
    # offset = 3rd largest (1): a->4, b->2, c dropped
    assert d1 == 1 and counters == {"a": 4, "b": 2}
    d2 = _merge_counts(counters, pd.Series({"c": 10}), k=2)
    # merged {a:4,b:2,c:10}; offset = 2 -> {a:2,c:8}
    assert d2 == 2 and counters == {"a": 2, "c": 8}


@pytest.mark.parametrize("parts", [1, 3, 7])
def test_mg_guarantees_hold_for_every_partitioning(spark, parts):
    """est <= true, true - est <= D, D <= N/(k+1), and every key above
    the N/(k+1) threshold is detected — for several partitionings of an
    adversarial stream (one hot key drowning in a long tail)."""
    n_tail, hot = 3000, 1200
    rows = [("hot",)] * hot + [(f"u{i % n_tail}",) for i in range(n_tail * 2)]
    df = spark.createDataFrame(rows, "key string").repartition(parts)
    k = 16
    summ = misra_gries_summaries(df, "key", k).toPandas()
    cand = summ[summ.key.notna()].groupby("key").est.sum()
    D = int(summ[summ.key.isna()].dec.sum())
    n = len(rows)
    assert D <= n // (k + 1)
    true = pd.Series([r[0] for r in rows]).value_counts()
    for key, est in cand.items():
        assert est <= true[key]
        assert true[key] - est <= D
    # detection guarantee for the hot key (hot > N/(k+1))
    assert hot > n // (k + 1)
    assert "hot" in cand.index
    # candidate set stays metadata-sized
    assert len(cand) <= parts * k


def test_heavy_hitters_verdicts_all_true(spark, tables):
    out = REGISTRY["heavy_hitters_events"].spark(spark, SF_DIR).toPandas()
    assert len(out) >= 1  # the synthetic 'hot' key qualifies at any sf
    assert out.detected.all()
    assert out.within_bound.all()


# ------------------------------------------------ compaction semantics


def test_compaction_bins_partition_the_table(spark, tables):
    """Bins must cover every partition exactly once, preserve byte
    totals, and respect the ordering (bins are contiguous month
    ranges)."""
    out = (
        REGISTRY["compaction_plan_orders"]
        .spark(spark, SF_DIR)
        .toPandas()
        .sort_values("bin_id")
        .reset_index(drop=True)
    )
    o = tables["orders"].toPandas()
    months = (
        o.o_orderdate.astype("int64") // 10**9 // 86400 // 30
    ).nunique()
    assert int(out.n_parts.sum()) == months
    assert int(out.n_rows.sum()) == len(o)
    # contiguous, non-overlapping month ranges in bin order
    for i in range(1, len(out)):
        assert out.from_month[i] > out.to_month[i - 1]


# ------------------------------------------- experimentation family


def test_cuped_single_scan_reused_exchange(spark):
    """Pooled moments and per-arm rollup must both re-aggregate the
    user-level frame (one events scan, exchange reuse) — never a second
    fact pass."""
    plan = _final_plan(spark, "cuped_ab_events")
    assert "ReusedExchange" in plan
    assert plan.count("events.parquet") <= 1


def test_decayed_leaderboard_anchor_is_pruned_scan(spark):
    """The max-ts anchor may rescan events but must read ONLY the ts
    column (column pruning reached the scan); the scoring arm reads
    exactly its three columns."""
    plan = _plan(spark, "decayed_leaderboard_events")
    assert "ReadSchema: struct<ts:timestamp_ntz>" in plan
    assert "CartesianProduct" not in plan


def test_cuped_adjustment_is_mean_preserving(spark, tables):
    """Exact CUPED identity: because sum_arms n_a*(xbar_a - xbar) = 0,
    the user-weighted average of the ADJUSTED means equals the pooled
    raw mean — the adjustment moves variance between arms, never the
    overall level. (A per-sample 'gap shrinks' check would be wrong:
    CUPED reduces variance in expectation, not on every draw.)"""
    out = REGISTRY["cuped_ab_events"].spark(spark, SF_DIR).toPandas()
    assert len(out) == 2
    n = out.n_users
    pooled_raw = (out.mean_y * n).sum() / n.sum()
    pooled_adj = (out.mean_y_cuped * n).sum() / n.sum()
    assert abs(pooled_adj - pooled_raw) < 1e-5  # rounding slack (6 dp)


def test_decayed_scores_bounded_by_raw_sums(spark, tables):
    """Each decayed score is a sum of value*exp(-dt/tau) with decay in
    (0, 1]: positive, and no larger than the raw per-type value sum."""
    out = (
        REGISTRY["decayed_leaderboard_events"]
        .spark(spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    raw = (
        tables["events"]
        .groupBy("event_type")
        .agg(F.sum("value").alias("s"))
        .toPandas()
        .set_index("event_type")
    )
    for et, row in out.iterrows():
        assert 0.0 < row.decayed_score <= raw.loc[et].s + 1e-6
