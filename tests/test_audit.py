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


def test_linear_attribution_conserves_purchase_value(spark, tables):
    """Σ per-click credits == Σ value of purchases that had ≥1 click in
    the window (each touched purchase's value is split, never lost or
    double-counted), within credit-rounding tolerance."""
    from pyspark.sql import functions as F  # noqa: F811
    from qa_data_pipeline_rag_llm_spark.plans.queries_temporal import (
        ATTR_WINDOW_US,
    )

    out = REGISTRY["attribution_linear_events"].spark(spark, SF_DIR)
    attributed = out.agg(F.sum("attributed_value")).collect()[0][0] or 0.0

    ev = tables["events"]
    us = F.unix_micros("ts")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event"), "user_id", us.alias("p_us"), "value"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), us.alias("c_us")
    )
    gap = F.col("p_us") - F.col("c_us")
    touched_value = (
        p.join(c, (F.col("user_id") == F.col("c_user")))
        .filter((gap >= 0) & (gap <= ATTR_WINDOW_US))
        .select("p_event", "value")
        .distinct()
        .agg(F.sum("value"))
        .collect()[0][0]
        or 0.0
    )
    assert abs(attributed - touched_value) < max(1e-3, 1e-5 * touched_value)


def test_survivorship_covers_all_docs_once(spark, tables):
    rows = REGISTRY["survivorship_documents"].spark(spark, SF_DIR).collect()
    assert sum(r.n_members for r in rows) == tables["documents"].count()
    assert all(r.survivor_doc_id is not None for r in rows)


def test_streaming_near_dup_gate_covers_stream_side(spark, tables):
    """Every odd-id doc appears exactly once; is_new replays the count."""
    rows = REGISTRY["streaming_near_dup_gate"].spark(spark, SF_DIR).collect()
    n_odd = tables["documents"].filter(F.col("doc_id") % 2 == 1).count()
    assert len(rows) == n_odd
    assert len({r.doc_id for r in rows}) == n_odd
    for r in rows:
        assert r.is_new == (r.n_band_hits == 0)
