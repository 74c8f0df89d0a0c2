"""Registry-wide output contract: no ArrayType/MapType in result schemas.

The driver's correctness canonicalizer lexsorts result rows in pandas;
an ndarray cell raises ``TypeError: unhashable type`` (CORRECTNESS_r04:
array_funcs_orders, hof_token_metrics). Arrays/maps may flow natively
THROUGH a plan, but every registered query's FINAL projection must
stringify them (array_join / to_json — the order_line_ids pattern,
plans/queries.py:270). This gate makes the whole class unrepresentable.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
from tests.conftest import SF_DIR

ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_no_array_or_map_in_output_schema(name, spark, tables):
    df = REGISTRY[name].spark(spark, SF_DIR)
    offenders = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType))
    ]
    assert not offenders, (
        f"{name}: output schema exposes array/map columns {offenders} — "
        "the driver canonicalizer cannot hash ndarray cells; stringify "
        "the final projection (array_join/to_json + array_to_string in "
        "the oracle)"
    )
