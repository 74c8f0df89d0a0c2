"""LM-perplexity filter math (plans/queries_lmfilter.py).

The registry oracles pin the queries against DuckDB on the real corpus;
these pin the OPERATOR arithmetic on a corpus tiny enough to hand-compute
the add-half-smoothed unigram LM and every per-doc surprisal, including
the exact integer rounding chain both engines replay.
"""

from __future__ import annotations

import math

import pytest

from qa_data_pipeline_rag_llm_spark.plans.queries_lmfilter import (
    _LN9,
    _lm_doc6_from,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _expected_h6(doc_counts, lm_counts):
    """Replay the exact rounding chain: lp9/z9 rounded once, integer
    sums, one double division at the end."""
    n = sum(lm_counts.values())
    v = len(lm_counts)
    z9 = round(math.log(2 * n + v) * _LN9)
    lp9 = {w: round(math.log(2 * c + 1) * _LN9) for w, c in lm_counts.items()}
    s9 = sum(c * (z9 - lp9[w]) for w, c in doc_counts.items())
    n_tok = sum(doc_counts.values())
    return round(s9 / (n_tok * 1000.0))


def test_hand_computed_unigram_surprisal(spark):
    # corpus: d1 = "a a b", d2 = "c"  ->  counts a=2 b=1 c=1, N=4, V=3
    rows = [(1, "s1", "a a b"), (2, "s2", "c")]
    doc6, g6 = _lm_doc6_from(_docs(spark, rows))
    got = {r.doc_id: r for r in doc6.collect()}
    lm = {"a": 2, "b": 1, "c": 1}
    want1 = _expected_h6({"a": 2, "b": 1}, lm)
    want2 = _expected_h6({"c": 1}, lm)
    assert got[1].n_tok == 3 and got[2].n_tok == 1
    assert got[1].h6 == want1
    assert got[2].h6 == want2
    # the rarer-token doc is more surprising than the common-token one
    assert got[2].h6 > got[1].h6
    # corpus baseline: total s9 over total tokens, same rounding chain
    z9 = round(math.log(11) * _LN9)
    lp9 = {w: round(math.log(2 * c + 1) * _LN9) for w, c in lm.items()}
    s9_tot = (2 * (z9 - lp9["a"]) + (z9 - lp9["b"])) + (z9 - lp9["c"])
    assert g6.collect()[0].g6 == round(s9_tot / (4 * 1000.0))


def test_uniform_corpus_has_uniform_surprisal(spark):
    # every doc is one distinct token used once: all h6 identical and
    # equal to the baseline -> no outliers possible in either band
    rows = [(i, "s", w) for i, w in enumerate(["aa", "bb", "cc", "dd"])]
    doc6, g6 = _lm_doc6_from(_docs(spark, rows))
    hs = {r.h6 for r in doc6.collect()}
    assert len(hs) == 1
    assert g6.collect()[0].g6 == hs.pop()


def test_empty_and_null_text_docs_are_unscored(spark):
    rows = [(1, "s", "a a b"), (2, "s", ""), (3, "s", None)]
    doc6, _ = _lm_doc6_from(_docs(spark, rows))
    assert [r.doc_id for r in doc6.collect()] == [1]


def test_repetition_scores_below_diverse_text(spark):
    # d1 spams one token; d2 spreads over rare ones. Same length; the
    # spam doc's tokens are corpus-common (it created the mass itself),
    # so its per-token surprisal must come out LOWER — the lo-outlier
    # band the quality gate uses for degenerate text.
    rows = [
        (1, "s", " ".join(["spam"] * 8)),
        (2, "s", "one two three four five six seven eight"),
    ]
    doc6, _ = _lm_doc6_from(_docs(spark, rows))
    got = {r.doc_id: r.h6 for r in doc6.collect()}
    assert got[1] < got[2]


def _kl_rows(spark, rows):
    import tempfile

    from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY

    tmp = tempfile.mkdtemp(prefix="klsrc")
    df = _docs(spark, rows)
    df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    out = REGISTRY["source_kl_matrix"].spark(spark, tmp)
    return {(r.source_a, r.source_b): r.kl_nats for r in out.collect()}


def test_kl_identical_sources_is_zero(spark):
    # two sources with the SAME token distribution -> KL 0 both ways
    rows = [(1, "x", "a a b c"), (2, "y", "a a b c")]
    got = _kl_rows(spark, rows)
    assert got[("x", "y")] == pytest.approx(0.0, abs=1e-6)
    assert got[("y", "x")] == pytest.approx(0.0, abs=1e-6)


def test_kl_nonnegative_and_asymmetric(spark):
    # y is a strict vocabulary subset of x: KL must be >= 0 both ways
    # and ASYMMETRIC (the subset direction differs from the superset)
    rows = [
        (1, "x", "a b c d e f g h"),
        (2, "y", "a a a a a a a b"),
    ]
    got = _kl_rows(spark, rows)
    assert got[("x", "y")] > 0 and got[("y", "x")] > 0
    # hand-computed: 0.622779 uniform->skewed, 0.731246 skewed->uniform
    assert got[("x", "y")] == pytest.approx(0.622779, abs=2e-6)
    assert got[("y", "x")] == pytest.approx(0.731246, abs=2e-6)


def test_kl_matches_python_reference(spark):
    # hand-replay the smoothed KL over the full vocab in plain Python,
    # including the 1e-9 log rounding chain
    rows = [(1, "x", "a a b"), (2, "y", "b c c c")]
    got = _kl_rows(spark, rows)
    counts = {"x": {"a": 2, "b": 1}, "y": {"b": 1, "c": 3}}
    vocab = {"a", "b", "c"}

    def l9(c):
        return round(math.log(2 * c + 1) * _LN9)

    def z(src):
        n = sum(counts[src].values())
        return 2 * n + len(vocab), round(math.log(2 * n + len(vocab)) * _LN9)

    for s, t in (("x", "y"), ("y", "x")):
        den_s, z_s = z(s)
        _, z_t = z(t)
        tot = sum(
            (2 * counts[s].get(w, 0) + 1)
            * (l9(counts[s].get(w, 0)) - l9(counts[t].get(w, 0)))
            for w in vocab
        )
        want = tot / (den_s * _LN9) + (z_t - z_s) / _LN9
        assert got[(s, t)] == pytest.approx(want, abs=2e-6), (s, t)


def test_ref_lm_oov_and_floor(spark):
    """Reference-LM scoring: docs outside the clean slice score against
    the slice-trained LM, OOV tokens take the smoothing floor and are
    counted. Uses the registry builder over a temp documents table with
    one Gopher-passing doc (long, clean) and one junk doc whose tokens
    are all out-of-reference-vocabulary."""
    import tempfile

    from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY

    clean = " ".join(
        "the quick brown fox jumps over a lazy dog and runs home with "
        "its friends to share some food after the long day of running "
        "around the field".split()
    )
    rows = [
        (1, "good", clean),            # passes Gopher (20..1000 tokens etc.)
        (2, "junk", "zzzzz qqqqq xxxxx"),  # fails; fully OOV vs the ref LM
    ]
    tmp = tempfile.mkdtemp(prefix="reflm")
    _docs(spark, rows).write.mode("overwrite").parquet(
        f"{tmp}/documents.parquet"
    )
    out = {
        r.source: r
        for r in REGISTRY["lm_ref_surprisal_by_source"]
        .spark(spark, tmp)
        .collect()
    }
    assert set(out) == {"good", "junk"}
    assert out["good"].oov_rate == 0.0
    assert out["junk"].oov_rate == 1.0
    # all-OOV text must be MORE surprising than in-reference text
    assert out["junk"].mean_nats > out["good"].mean_nats


def test_ref_lm_degenerate_corpus_no_clean_slice(spark):
    """Advice r09: ZERO Gopher-pass docs means an empty reference LM
    (v_ref = 0). DuckDB's ln(0) → -inf → BIGINT cast ERRORS while
    Spark's log(0) is NULL, so without the guard the twins diverge.
    Both must now emit NULL mean_nats with oov_rate = 1 — verified by
    running BOTH twins on the same degenerate parquet."""
    import tempfile

    import duckdb

    from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY

    rows = [  # every doc far below the 20-token Gopher floor
        (1, "a", "zz qq"),
        (2, "b", "xx yy ww"),
    ]
    tmp = tempfile.mkdtemp(prefix="reflm_degen")
    _docs(spark, rows).write.mode("overwrite").parquet(
        f"{tmp}/documents.parquet"
    )
    spec = REGISTRY["lm_ref_surprisal_by_source"]
    got = {r.source: r for r in spec.spark(spark, tmp).collect()}
    assert set(got) == {"a", "b"}
    for r in got.values():
        assert r.mean_nats is None
        assert r.oov_rate == 1.0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp}/documents.parquet/*.parquet'"
    )
    oracle = {
        src: (mean_nats, oov)
        for src, _n, mean_nats, oov in con.execute(spec.oracle).fetchall()
    }
    assert oracle == {
        s: (r.mean_nats, r.oov_rate) for s, r in got.items()
    }
