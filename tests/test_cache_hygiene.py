"""No registry query may leak cached blocks into a long-lived session
(VERDICT r02 #9): a lazily-returned DataFrame can never unpersist, so
persist() is only legal inside a query when a try/finally releases it
before return (pagerank/kmeans do this around localCheckpoint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
from tests.conftest import SF_DIR

# every query that historically persisted, plus the iterative ones that
# still legitimately persist-then-release inside a try/finally
_FORMERLY_LEAKY = [
    "oov_rate_by_source",
    "label_centroid_distances",
    "silhouette_by_label",
    "pagerank_cust_supp",
    "kmeans_fixedpoint_embeddings",
]


def _cached_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_registry_queries_leave_no_cached_rdds(spark):
    """persist() leaks live forever; localCheckpoint blocks (pagerank /
    kmeans results) are released by the ContextCleaner once the result
    DataFrame is dropped — so the real-session contract is: after the
    consumer lets go of the result, the cache drains to baseline."""
    import gc
    import time

    from qa_data_pipeline_rag_llm_spark import catalog

    # another test may have turned on the engine's deliberate table
    # cache (enable_table_persist) — pin it off so the sweep measures
    # query-internal leaks, not the shared-table memo
    prior = catalog._PERSIST
    catalog.enable_table_persist(False)
    base = _cached_rdd_count(spark)
    for name in _FORMERLY_LEAKY:
        df = REGISTRY[name].spark(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        del df
    deadline = time.time() + 120  # ContextCleaner is async; generous on a loaded box
    while _cached_rdd_count(spark) > base and time.time() < deadline:
        gc.collect()  # free the py4j refs → JVM weak refs → ContextCleaner
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
    leaked = _cached_rdd_count(spark) - base
    catalog.enable_table_persist(prior)
    # negative = blocks left behind by EARLIER tests drained during this
    # one (ContextCleaner is async) — that is the opposite of a leak
    assert leaked <= 0, (
        "registry queries leaked cached RDD blocks into the session"
    )


def test_no_unreleased_persist_in_query_modules():
    """Static gate: any persist() in plans/ must sit in a function that
    also unpersists (the localCheckpoint-then-release pattern)."""
    import ast
    import pathlib

    plans = pathlib.Path(__file__).parents[1] / (
        "qa_data_pipeline_rag_llm_spark/plans"
    )
    offenders = []
    for path in sorted(plans.glob("*.py")):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, ast.FunctionDef):
                continue
            src = ast.unparse(node)
            if ".persist()" in src and ".unpersist()" not in src:
                offenders.append(f"{path.name}:{node.name}")
    assert not offenders, f"persist() without unpersist(): {offenders}"
