"""Semantic tests for the audit/IVM family (beyond the golden oracles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
from tests.conftest import SF_DIR


def test_integrity_audit_covers_all_checks_and_pk_pass(spark, tables):
    rows = REGISTRY["integrity_audit_tables"].spark(spark, SF_DIR).collect()
    by_name = {(r.check_name, r.table_name): r for r in rows}
    assert len(rows) == 7
    for r in rows:
        assert r.n_violations >= 0
        assert r["pass"] == (r.n_violations == 0)
    # synthetic keys are unique and FKs resolve — these must pass
    assert by_name[("pk_unique", "orders")]["pass"]
    assert by_name[("pk_unique", "customer")]["pass"]
    assert by_name[("fk_orphan_custkey", "orders")]["pass"]


def test_incremental_merge_equals_single_pass(spark, tables):
    """merge(partial(hist), partial(delta)) ≡ one-shot aggregate — the
    decomposability property, checked inside Spark (the oracle checks it
    cross-engine)."""
    merged = {
        r.user_id: (r.n_events, r.total_value)
        for r in REGISTRY["incremental_agg_merge_events"]
        .spark(spark, SF_DIR)
        .collect()
    }
    direct = {
        r.user_id: (r.n_events, r.total_value)
        for r in tables["events"]
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("total_value"),
        )
        .collect()
    }
    assert merged == direct
