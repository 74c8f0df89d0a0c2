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


# --------------------------------------------------------------------------
# Adversarial set shapes for _verify_jaccard (VERDICT r08 ask #7): every
# dedup entry point now routes through the r8 set-array form
# (dedup.py:_pair_intersections); the plan gate pins the SHAPE, these pin
# the MATH on the shapes real corpora produce at the margins.

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _sets_frame(spark, rows, n=2):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return D._doc_shingle_sets(df, "text", "doc_id", n)


def _all_pairs(spark, ids):
    ids = sorted(ids)
    rows = [
        (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
    ]
    return spark.createDataFrame(rows, "doc_a string, doc_b string")


def test_empty_text_docs_are_single_shingle_sets(spark):
    """word_shingles is total: empty text yields ONE (empty-string)
    shingle, so two empty docs are identical sets (J = 1.0) while an
    empty doc shares nothing with a real one — that pair must DROP
    (the n_inter > 0 contract), not surface as jaccard 0/NULL."""
    rows = [("e1", ""), ("e2", ""), ("x", "real words in this one")]
    sets = _sets_frame(spark, rows)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D._verify_jaccard(
            _all_pairs(spark, ["e1", "e2", "x"]), sets, 0.0
        ).collect()
    }
    assert got == {("e1", "e2"): 1.0}
    # and end-to-end: the blocking layer surfaces the empty-empty pair
    # (the "" shingle has df=2, inside (1, max_df]) with the same value
    df = spark.createDataFrame(rows, "doc_id string, text string")
    e2e = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(
            df, shingle_n=2, max_df=10, threshold=0.0
        ).collect()
    }
    assert e2e == {("e1", "e2"): 1.0}


def test_all_identical_corpus_is_complete_at_one(spark):
    """k identical docs: every unordered pair verifies at exactly 1.0 —
    C(k,2) rows, no duplicates, no self-pairs."""
    k = 5
    rows = [(f"d{i}", "same exact text every time") for i in range(k)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = D.ngram_jaccard_pairs(
        df, shingle_n=2, max_df=k, threshold=0.0
    ).collect()
    assert len(out) == k * (k - 1) // 2
    assert all(r.jaccard == 1.0 and r.doc_a < r.doc_b for r in out)
    assert len({(r.doc_a, r.doc_b) for r in out}) == len(out)


def test_max_df_boundary_is_inclusive(spark):
    """df == max_df shingles still block (the (1, max_df] contract);
    df == max_df + 1 prunes every candidate — the knife-edge between
    'near-linear at scale' and 'silently empty output'."""
    k = 5
    rows = [(f"d{i}", "same exact text every time") for i in range(k)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    at = D.ngram_jaccard_pairs(df, shingle_n=2, max_df=k, threshold=0.0)
    below = D.ngram_jaccard_pairs(
        df, shingle_n=2, max_df=k - 1, threshold=0.0
    )
    assert at.count() == k * (k - 1) // 2
    assert below.count() == 0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=0,
            max_size=6,
        ),
        min_size=2,
        max_size=5,
    )
)
def test_verify_jaccard_matches_python_sets(docs_words):
    """Value property: over arbitrary tiny corpora (including empty and
    single-word docs), _verify_jaccard on ALL unordered pairs equals the
    plain-Python set Jaccard of Spark's OWN shingle sets — same rounding,
    same empty-intersection drop."""
    spark = _hyp_spark()
    rows = [(f"d{i}", " ".join(ws)) for i, ws in enumerate(docs_words)]
    sets_df = _sets_frame(spark, rows)
    sets = {r.doc: set(r.shset) for r in sets_df.collect()}
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D._verify_jaccard(
            _all_pairs(spark, [r[0] for r in rows]), sets_df, 0.0
        ).collect()
    }
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter > 0:
                want[(a, b)] = inter / len(sets[a] | sets[b])
    assert set(got) == set(want)
    for key, val in want.items():
        assert abs(got[key] - val) < 5e-7, (key, got[key], val)


_HYP_SPARK = None


def _hyp_spark():
    """hypothesis examples can't take pytest fixtures — reuse the live
    session the surrounding suite already built."""
    global _HYP_SPARK
    if _HYP_SPARK is None:
        from pyspark.sql import SparkSession

        _HYP_SPARK = SparkSession.getActiveSession() or (
            SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    return _HYP_SPARK


def test_word_shingles_kernel_matches_sql_twin(spark, tables):
    """r11: word_shingles' default moved to an Arrow kernel over the
    JVM token arrays (5.7x at sf0.1); the expression form stays as
    word_shingles_sql. Every consumer (minhash, n-gram Jaccard, LSH
    banding, span dedup, decontamination) inherits the kernel, so pin
    bit-identical output across the real corpus plus the edge shapes
    (null text, empty, shorter-than-n, exactly-n), at both widths the
    registry uses."""
    from qa_data_pipeline_rag_llm_spark.functions.text import (
        word_shingles,
        word_shingles_sql,
    )

    docs = tables["documents"].select("doc_id", "text")
    edges = spark.createDataFrame(
        [
            (100001, None),
            (100002, ""),
            (100003, "one"),
            (100004, "a b c d e f g h"),
            (100005, "tabs\tand\nnewlines   spaced"),
        ],
        "doc_id long, text string",
    )
    d = docs.unionByName(edges)
    for n in (2, 3, 8):
        got = sorted(
            map(
                repr,
                d.select(
                    "doc_id", word_shingles("text", n).alias("s")
                ).collect(),
            )
        )
        want = sorted(
            map(
                repr,
                d.select(
                    "doc_id", word_shingles_sql("text", n).alias("s")
                ).collect(),
            )
        )
        assert got == want, n


def test_int60_hashed_pairs_equal_string_pairs(spark):
    """r12: the jaccard/containment families hash shingles to 60-bit
    longs before blocking/intersection. The hash is injective on every
    real corpus slice (P[collision] ≈ 2^-60 per within-doc pair), so the
    pair set AND the jaccard values must equal the string-shingle path
    exactly — pinned here on the sf0.001 documents table by rebuilding
    the string variant inline."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR

    from qa_data_pipeline_rag_llm_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    hashed = sorted(
        map(
            tuple,
            D.ngram_jaccard_pairs(docs, shingle_n=3, max_df=20, threshold=0.2)
            .select("doc_a", "doc_b", "jaccard")
            .collect(),
        )
    )
    sh = D._doc_shingles(docs, "text", "doc_id", 3)
    cand = D._blocked_candidates(sh, 20)
    strings = sorted(
        map(
            tuple,
            D._verify_jaccard(
                cand, D._doc_shingle_sets(docs, "text", "doc_id", 3), 0.2
            )
            .select("doc_a", "doc_b", "jaccard")
            .collect(),
        )
    )
    assert hashed == strings and len(hashed) > 0
