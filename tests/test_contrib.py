"""plans/queries_contrib: span removal, novelty, entropy, hard negatives.

The oracle sweep (test_oracle.py) already hash-matches each query against
DuckDB on the shared testdata; these tests pin the SEMANTIC invariants on
constructed corpora where the right answer is known by design — planted
duplicate spans, copied documents, uniform token distributions.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries_contrib import (
    SPAN_N,
    hard_negatives_embeddings,
    ngram_novelty_by_source,
    remove_dup_spans_documents,
    token_entropy_by_source,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture()
def patched_loader(monkeypatch):
    """Route _t('documents') / _t('embeddings') to a constructed frame."""

    def patch(df, table="documents"):
        import qa_data_pipeline_rag_llm_spark.plans.queries_contrib as M

        monkeypatch.setattr(
            M, "_t", lambda spark, sf_dir, name: df if name == table else None
        )

    return patch


SHARED = "alpha bravo charlie delta echo foxtrot golf hotel"  # exactly 8 words


def test_remove_dup_spans_planted_duplicate(spark, patched_loader):
    d = _docs(
        spark,
        [
            (f"unique one two three {SHARED} tail words here", "s0"),
            (f"other prefix {SHARED} closing remark", "s1"),
            ("short doc under eight words total", "s2"),
        ],
    )
    patched_loader(d)
    out = {
        r["doc_id"]: r
        for r in remove_dup_spans_documents(spark, "unused").collect()
    }
    # the shared 8-gram is excised from BOTH carriers, nothing else
    assert out[0]["n_removed"] == SPAN_N
    assert out[1]["n_removed"] == SPAN_N
    assert "alpha" not in out[0]["clean_text"]
    assert out[0]["clean_text"] == "unique one two three tail words here"
    assert out[1]["clean_text"] == "other prefix closing remark"
    # a doc with no duplicated span is untouched
    assert out[2]["n_removed"] == 0
    assert out[2]["clean_text"] == "short doc under eight words total"
    # accounting invariant: kept words == n_words - n_removed
    for r in out.values():
        kept = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert kept == r["n_words"] - r["n_removed"]


def test_remove_dup_spans_overlapping_spans_union(spark, patched_loader):
    """Two overlapping dup 8-grams must excise their position UNION once
    (9 words), not double-count the 7-word overlap."""
    nine = "w1 w2 w3 w4 w5 w6 w7 w8 w9"  # both 8-grams inside are shared
    d = _docs(
        spark,
        [
            (f"{nine} filler apple banana", "s0"),
            (f"lead {nine} trailer cherry", "s1"),
        ],
    )
    patched_loader(d)
    out = {
        r["doc_id"]: r
        for r in remove_dup_spans_documents(spark, "unused").collect()
    }
    assert out[0]["n_removed"] == 9
    assert out[0]["clean_text"] == "filler apple banana"
    assert out[1]["n_removed"] == 9
    assert out[1]["clean_text"] == "lead trailer cherry"


def test_remove_dup_spans_intra_doc_repeats_survive(spark, patched_loader):
    """Duplication is CROSS-document (count distinct doc_id >= 2): a doc
    repeating its own 8-gram keeps all of it — that signal belongs to
    repetition_stats, not span removal."""
    rep = f"{SHARED} then once more {SHARED}"
    d = _docs(spark, [(rep, "s0"), ("entirely different words here now ok", "s1")])
    patched_loader(d)
    out = {r["doc_id"]: r for r in remove_dup_spans_documents(spark, "x").collect()}
    assert out[0]["n_removed"] == 0
    assert out[0]["clean_text"] == (
        "alpha bravo charlie delta echo foxtrot golf hotel then once "
        "more alpha bravo charlie delta echo foxtrot golf hotel"
    )


def test_ngram_novelty_copied_source_scores_zero(spark, patched_loader):
    base = "the quick brown fox jumps over the lazy dog again and again"
    d = _docs(spark, [(base, "orig"), (base, "copy"), (base, "copy")])
    patched_loader(d)
    out = {
        r["source"]: r for r in ngram_novelty_by_source(spark, "x").collect()
    }
    assert out["orig"]["novelty_rate"] == 1.0  # doc 0 saw every gram first
    assert out["copy"]["n_novel"] == 0  # pure re-crawl adds nothing
    assert out["copy"]["novelty_rate"] == 0.0


def test_token_entropy_uniform_is_log2_k(spark, patched_loader):
    # 8 distinct tokens, each once → H = log2(8) = 3 bits exactly
    d = _docs(spark, [("a1 b2 c3 d4 e5 f6 g7 h8", "uni")])
    patched_loader(d)
    row = token_entropy_by_source(spark, "x").collect()[0]
    assert row["n_tokens"] == 8 and row["n_types"] == 8
    assert row["entropy_bits"] == pytest.approx(3.0, abs=1e-6)
    # degenerate: one token repeated → zero entropy
    d2 = _docs(spark, [("same same same same", "deg")])
    patched_loader(d2)
    row2 = token_entropy_by_source(spark, "x").collect()[0]
    assert row2["entropy_bits"] == 0.0 and row2["n_types"] == 1


def test_hard_negatives_never_share_label_and_rank_by_sim(spark, tables):
    out = hard_negatives_embeddings(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out, "probe set must produce negatives"
    by_probe: dict[int, list] = {}
    for r in out:
        assert r["neg_label"] != r["probe_label"]
        by_probe.setdefault(r["probe_id"], []).append(r)
    for rows in by_probe.values():
        rows.sort(key=lambda r: r["rank"])
        sims = [r["sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
