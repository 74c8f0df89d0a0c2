"""Two-star connected components (operators/graph.py) vs min-label
propagation: identical labels on adversarial topologies, including the
long chains where propagation needs O(diameter) rounds and two-star
needs O(log n)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.operators.graph import (
    connected_components,
    connected_components_twostar,
)


def _labels(df):
    return sorted((r["id"], r["label"]) for r in df.collect())


def _both(spark, edges):
    e = spark.createDataFrame(edges, "src long, dst long")
    return (
        _labels(connected_components(e)),
        _labels(connected_components_twostar(e)),
    )


def test_twostar_matches_propagation_on_chain(spark):
    # a 25-node path (within propagation's round budget)
    a, b = _both(spark, [(i, i + 1) for i in range(25)])
    assert a == b
    assert all(lbl == 0 for _, lbl in b)


def test_twostar_handles_diameter_beyond_propagation_budget(spark):
    """A 40-node path: propagation's 30-round budget is exceeded (it now
    fails LOUD — silent truncation would poison keep/drop decisions);
    two-star labels it correctly in O(log n) rounds."""
    import pytest as _pytest

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e).collect()
    got = _labels(connected_components_twostar(e))
    assert all(lbl == 0 for _, lbl in got) and len(got) == 41


def test_twostar_matches_propagation_on_mixed_graph(spark):
    rng = random.Random(7)
    edges = []
    # several blobs + a chain + isolated pairs, shuffled ids
    for base in (100, 300, 500):
        ids = [base + i for i in range(12)]
        edges += [(rng.choice(ids), rng.choice(ids)) for _ in range(25)]
    edges += [(i, i + 1) for i in range(700, 720)]
    edges += [(900, 901), (903, 902)]
    edges = [(a, b) for a, b in edges if a != b]
    a, b = _both(spark, edges)
    assert a == b


def test_twostar_two_node_and_triangle(spark):
    a, b = _both(spark, [(5, 2), (10, 11), (11, 12), (12, 10)])
    assert a == b
    got = dict(b)
    assert got[5] == 2 and got[2] == 2
    assert got[10] == got[11] == got[12] == 10


def test_twostar_star_graph_reversed_ids(spark):
    # hub has the LARGEST id — exercises both star directions
    a, b = _both(spark, [(99, i) for i in range(5)])
    assert a == b
    assert all(lbl == 0 for _, lbl in b)


def test_twostar_edge_set_shrinks_to_star(spark):
    """After convergence every component is one star: n_edges =
    n_vertices - n_components."""
    edges = [(i, i + 1) for i in range(20)] + [(50, 51), (51, 52)]
    e = spark.createDataFrame(edges, "src long, dst long")
    labels = connected_components_twostar(e)
    n_vertices = labels.count()
    n_components = labels.select("label").distinct().count()
    n_non_roots = labels.filter(F.col("id") != F.col("label")).count()
    assert n_non_roots == n_vertices - n_components


def test_twostar_fails_loud_when_budget_exhausted(spark):
    """Exhausting max_iter without a fixpoint must raise, not emit a
    corrupt multi-row-per-vertex labeling (review r03)."""
    import pytest as _pytest

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="did not detect a fixpoint"):
        connected_components_twostar(e, max_iter=1).collect()
