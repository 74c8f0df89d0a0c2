"""plans/queries_monitoring: KS drift, PMI, encoding audit, q-normalize.

The oracle sweep (test_oracle.py) hash-matches each query against DuckDB
on the shared testdata; these tests pin SEMANTIC invariants on
constructed inputs where the right answer is known by design — planted
distribution shifts, planted collocations, degenerate cardinalities,
singleton sources.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

import qa_data_pipeline_rag_llm_spark.plans.queries_monitoring as M
from qa_data_pipeline_rag_llm_spark.plans.queries_monitoring import (
    KS_SPLIT_DAY,
    PMI_MIN,
    dict_encoding_audit,
    ks_drift_events,
    pmi_bigrams_documents,
    quantile_normalize_sources,
)


def _events(spark, rows):
    """rows: (day_of_month, value) pairs."""
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, day, 12, 0, 0), 1, "view", v, "{}")
            for i, (day, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture()
def patched_loader(monkeypatch):
    def patch(df):
        monkeypatch.setattr(
            M, "_t", lambda spark, sf_dir, name: df
        )

    return patch


# --------------------------------------------------------------------- KS


def test_ks_identical_halves_no_drift(spark, patched_loader):
    rows = [(d, float(v)) for v in range(1, 41) for d in (3, KS_SPLIT_DAY + 3)]
    patched_loader(_events(spark, rows))
    out = ks_drift_events(spark, "unused").collect()
    assert len(out) == 1
    r = out[0]
    # same 40-value sample on each side: every ECDF gap is exactly 0
    assert (r.n1, r.n2, r.d_num) == (40, 40, 0)
    assert not r.drift


def test_ks_disjoint_halves_maximal_drift(spark, patched_loader):
    rows = [(3, float(v)) for v in range(1, 31)] + [
        (KS_SPLIT_DAY + 3, float(v)) for v in range(100, 130)
    ]
    patched_loader(_events(spark, rows))
    r = ks_drift_events(spark, "unused").collect()[0]
    # disjoint supports: D = 1, attained at the largest sample-1 value
    assert r.d_num == r.n1 * r.n2
    assert r.at_value == 30.0
    assert r.d9 == 10**9
    assert r.drift


def test_ks_empty_half_yields_no_rows(spark, patched_loader):
    patched_loader(_events(spark, [(3, float(v)) for v in range(10)]))
    assert ks_drift_events(spark, "unused").count() == 0


def test_ks_statistic_matches_bruteforce(spark, patched_loader):
    rows = [(3, float(v % 7)) for v in range(25)] + [
        (KS_SPLIT_DAY + 3, float((v * 3) % 11)) for v in range(18)
    ]
    patched_loader(_events(spark, rows))
    r = ks_drift_events(spark, "unused").collect()[0]
    s1 = sorted(v for d, v in rows if d <= KS_SPLIT_DAY)
    s2 = sorted(v for d, v in rows if d > KS_SPLIT_DAY)
    n1, n2 = len(s1), len(s2)
    want = max(
        abs(
            n2 * sum(1 for x in s1 if x <= v)
            - n1 * sum(1 for x in s2 if x <= v)
        )
        for v in set(s1) | set(s2)
    )
    assert (r.n1, r.n2, r.d_num) == (n1, n2, want)


# -------------------------------------------------------------------- PMI


def test_pmi_planted_collocation_ranks_first(spark, patched_loader):
    # "zq xv" always and only co-occur; filler tokens are independent
    docs = [("zq xv " + " ".join(f"t{i % 3}" for i in range(8)), "s")] * 6
    patched_loader(_docs(spark, docs))
    out = pmi_bigrams_documents(spark, "unused").collect()
    top = out[0]
    assert (top.w1, top.w2) == ("zq", "xv")
    # exact expected pmi9 from the per-term rounded-ln construction:
    # PMI = ln(c_ab * B / (out_a * in_b)) over the bigram table
    b = 6 * 9  # bigrams
    ln9 = lambda x: round(math.log(x) * 10**9)  # noqa: E731
    want = ln9(6) + ln9(b) - ln9(6) - ln9(6)
    assert top.pmi9 == want
    assert top.n_pair == 6 and top.n_out == 6 and top.n_in == 6


def test_pmi_below_min_support_excluded(spark, patched_loader):
    reps = PMI_MIN - 1  # planted pair occurs PMI_MIN-1 times: excluded
    docs = [("aa bb", "s")] * reps + [
        (" ".join(f"f{i}" for i in range(20)), "s")
    ] * PMI_MIN
    patched_loader(_docs(spark, docs))
    out = pmi_bigrams_documents(spark, "unused").collect()
    assert all((r.w1, r.w2) != ("aa", "bb") for r in out)


# ------------------------------------------------------------- dict audit


def test_dict_audit_verdicts_by_cardinality(spark, patched_loader, monkeypatch):
    docs = _docs(
        spark,
        [(f"unique text payload number {i} with entropy", "src") for i in range(50)],
    )
    patched_loader(docs)
    monkeypatch.setattr(
        M, "DICT_AUDIT_COLS", [("documents", "source"), ("documents", "text")]
    )
    rows = {r.col_name: r for r in dict_encoding_audit(spark, "unused").collect()}
    # one distinct source over 50 rows: ndv=1, 1-bit codes, dictionary wins
    assert rows["source"].ndv == 1
    assert rows["source"].code_bits == 1
    assert rows["source"].verdict == "dict"
    # all-distinct long text: dictionary pays payload + codes for nothing
    assert rows["text"].ndv == 50
    assert rows["text"].verdict == "plain"
    assert rows["text"].code_bits == math.ceil(math.log2(50))


# -------------------------------------------------------- q-normalization


def test_qnorm_single_source_is_identity(spark, patched_loader):
    docs = _docs(spark, [("x" * (7 * (i % 13) + 1), "only") for i in range(40)])
    patched_loader(docs)
    out = quantile_normalize_sources(spark, "unused").collect()
    assert len(out) == 40
    # one source == the pool: the mapping must be the identity
    assert all(r.q_norm == r.n_chars for r in out)


def test_qnorm_singleton_source_maps_to_pooled_median(spark, patched_loader):
    # 9 docs in 'big' with n_chars 1..9, one doc in 'solo' with n_chars 100
    rows = [("x" * v, "big") for v in range(1, 10)] + [("x" * 100, "solo")]
    patched_loader(_docs(spark, rows))
    out = {
        (r.source, r.n_chars): r.q_norm
        for r in quantile_normalize_sources(spark, "unused").collect()
    }
    # pooled order: 1..9,100 (N=10); m=1 branch -> position (10+1) div 2 = 5
    assert out[("solo", 100)] == 5


def test_qnorm_shifted_source_calibrates_onto_pool(spark, patched_loader):
    # source 'b' is 'a' shifted +1000: within-source ranks agree, so both
    # sources must map rank-for-rank onto the SAME pooled positions
    rows = [("x" * v, "a") for v in (10, 20, 30, 40, 50)] + [
        ("x" * (1000 + v), "b") for v in (10, 20, 30, 40, 50)
    ]
    patched_loader(_docs(spark, rows))
    out = quantile_normalize_sources(spark, "unused").collect()
    by_rank = {}
    for r in out:
        by_rank.setdefault(r.source, []).append((r.n_chars, r.q_norm))
    a = [q for _, q in sorted(by_rank["a"])]
    b = [q for _, q in sorted(by_rank["b"])]
    assert a == b
