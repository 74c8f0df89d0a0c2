"""One-row-per-doc contract of the dedup family (VERDICT r07 ask #5).

``_doc_shingles`` builds shingle SETS per row (``array_distinct`` before
the explode — the r7 zero-shuffle rewrite, dedup.py). That is equivalent
to the removed global ``.distinct()`` ONLY when callers pass one row per
document id; duplicated ids inflate shingle multiplicities and with them
intersection counts, Jaccard, and containment. These tests pin BOTH sides
of the contract:

* the distortion is real — a duplicated id measurably inflates Jaccard
  (the test that would have caught a duplicate-id caller, ask #5's Done);
* ``validate=True`` fails loud on exactly that input, and is a no-op
  (same plan, same rows) on compliant input.
"""

from __future__ import annotations

import pytest

from qa_data_pipeline_rag_llm_spark.operators import dedup as D

DOCS = [
    ("a", "the quick brown fox jumps over the lazy dog tonight"),
    ("b", "the quick brown fox jumps over the lazy cat tonight"),
    ("c", "completely unrelated text about parquet shuffles and joins"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


@pytest.fixture(scope="module")
def docs_dup(spark):
    # doc "a" appears twice — the union-without-keying shape
    return spark.createDataFrame(
        DOCS + [DOCS[0]], "doc_id string, text string"
    )


def _pairs(df, **kw):
    return sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in D.ngram_jaccard_pairs(
            df, shingle_n=2, max_df=10, threshold=0.0, **kw
        ).collect()
    )


def test_duplicate_ids_corrupt_pair_output(spark, docs, docs_dup):
    """The documented failure mode actually happens. Under the r8
    array-set verification a duplicated id joins once PER ROW, so the
    pair table gains duplicate rows (identical text → repeated rows;
    divergent text under one id → CONFLICTING jaccard values for the
    same pair key) where the pre-r7 global-distinct form silently
    inflated a single value. Either way the output stops being one row
    per pair — the corruption validate=True exists to catch."""
    clean = _pairs(docs)
    dup = _pairs(docs_dup)
    assert clean == [("a", "b", 0.636364)]
    assert dup == [("a", "b", 0.636364), ("a", "b", 0.636364)]
    # divergent text under the duplicated id: conflicting values
    diverged = spark.createDataFrame(
        DOCS + [("a", DOCS[0][1] + " extra words here")],
        "doc_id string, text string",
    )
    vals = _pairs(diverged)
    assert len(vals) == 2 and vals[0][2] != vals[1][2]


@pytest.mark.parametrize(
    "entry",
    [
        lambda df: D.minhash_lsh_pairs(df, validate=True),
        lambda df: D.minhash_incremental_pairs(
            df, D.F.col("doc_id") == "a", validate=True
        ),
        lambda df: D.ngram_jaccard_pairs(df, validate=True),
        lambda df: D.containment_pairs(df, validate=True),
        lambda df: D.simhash_pairs(df, validate=True),
    ],
    ids=["minhash", "incremental", "ngram", "containment", "simhash"],
)
def test_validate_rejects_duplicate_ids(docs_dup, entry):
    with pytest.raises(ValueError, match="duplicate rows"):
        entry(docs_dup)


def test_validate_is_transparent_on_compliant_input(docs):
    on = sorted(
        map(tuple, D.ngram_jaccard_pairs(docs, validate=True).collect())
    )
    off = sorted(map(tuple, D.ngram_jaccard_pairs(docs).collect()))
    assert on == off and on  # same result, and non-empty (a~b survive)
