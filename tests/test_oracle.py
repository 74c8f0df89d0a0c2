"""Golden tests: every oracle-checked registry query vs DuckDB (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
from tests.conftest import SF_DIR, assert_oracle_match

ORACLE_CHECKED = sorted(n for n, s in REGISTRY.items() if s.oracle)
NO_ORACLE = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle(name, spark, duck, tables):
    spec = REGISTRY[name]
    assert_oracle_match(spec.spark(spark, SF_DIR), duck.sql(spec.oracle), name)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_runs_without_oracle(name, spark, tables):
    """Non-SQL-expressible ops: smoke — runs, stable schema, ≥0 rows."""
    spec = REGISTRY[name]
    df = spec.spark(spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0
