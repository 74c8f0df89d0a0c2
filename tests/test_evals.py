"""Retrieval-eval family invariants, independent of the DuckDB oracle.

The oracle pins exact values on the shipped corpus; these pin the metric
DEFINITIONS, so a future corpus/testdata change that shifts values cannot
silently break a metric's meaning (e.g. an nDCG > 1 or a Jaccard
inconsistent with its own intersection count would pass a hash compare
against an equally-wrong oracle — both sides share the formula).
"""

from __future__ import annotations

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
from qa_data_pipeline_rag_llm_spark.plans.queries_evals import (
    EVAL_K,
    RECALL_CUTS,
)
from tests.conftest import SF_DIR


def _one_row(spark, name):
    rows = REGISTRY[name].spark(spark, SF_DIR).collect()
    assert len(rows) == 1
    return rows[0]


def test_eval_metrics_are_well_formed(spark):
    for name in ("retrieval_eval_bm25", "retrieval_eval_cosine"):
        r = _one_row(spark, name)
        assert r.k == EVAL_K
        assert 0 <= r.hits <= min(EVAL_K, r.n_rel)
        assert abs(r.precision_at_k - round(r.hits / EVAL_K, 6)) < 1e-12
        if r.n_rel:
            assert abs(r.recall_at_k - round(r.hits / r.n_rel, 6)) < 1e-12
        assert 0.0 <= r.mrr <= 1.0
        # a non-empty relevant pool makes IDCG > 0; DCG ≤ IDCG by the
        # rearrangement inequality (ideal ordering maximizes the sum)
        assert 0.0 <= r.ndcg <= 1.0, name
        # hits in the list at all ⇒ some reciprocal rank
        assert (r.mrr > 0) == (r.hits > 0)


def test_recall_curve_is_monotone_and_consistent(spark):
    rows = sorted(
        REGISTRY["eval_recall_curve_bm25"].spark(spark, SF_DIR).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == RECALL_CUTS
    for a, b in zip(rows, rows[1:]):
        assert a.hits <= b.hits  # deepening the cutoff never loses hits
        assert a.recall <= b.recall
    # the k=EVAL_K point must agree with the headline eval
    head = _one_row(spark, "retrieval_eval_bm25")
    assert rows[-1].hits == head.hits


def test_overlap_report_is_internally_consistent(spark):
    r = _one_row(spark, "retrieval_overlap_lex_vec")
    assert 0 <= r.n_common <= EVAL_K
    assert r.footrule >= 0
    if r.n_common == 0:
        assert r.footrule == 0
    # jaccard must equal n_common over the (unobserved) union, which is
    # bounded by [max(list sizes), 2k] — so jaccard ≥ n_common / 2k
    assert r.jaccard >= round(r.n_common / (2 * EVAL_K), 6) - 1e-12
    assert r.jaccard <= 1.0
