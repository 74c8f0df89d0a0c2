"""Sampling determinism + rate bounds (no cross-engine RNG oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
from tests.conftest import SF_DIR


def _sample(spark):
    from qa_data_pipeline_rag_llm_spark.plans.queries_reshape import (
        _stratified_sample,
    )

    return _stratified_sample(spark, SF_DIR)


def test_sample_verdict_all_green(spark, tables):
    rows = REGISTRY["sample_documents_stratified"].spark(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["rate_ok"] and r["deterministic_ok"], r


def test_sample_deterministic_under_seed(spark, tables):
    a = sorted(r["doc_id"] for r in _sample(spark).collect())
    b = sorted(r["doc_id"] for r in _sample(spark).collect())
    assert a == b and len(a) > 0


def test_sample_rates_within_bounds(spark, tables):
    got = {
        r["stratum"]: r["n"]
        for r in _sample(spark).groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["stratum"]: r["n"]
        for r in tables["documents"]
        .withColumn(
            "stratum", F.when(F.col("n_chars") < 200, "short").otherwise("long")
        )
        .groupBy("stratum")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for stratum, frac in (("short", 0.5), ("long", 0.1)):
        if totals.get(stratum, 0) < 30:
            continue  # too small for a rate assertion
        rate = got.get(stratum, 0) / totals[stratum]
        assert abs(rate - frac) < 0.15, (stratum, rate)
