"""Property tests for the curation/packing/sampling families (SURVEY.md §5.4):
invariants that must hold for ANY input, complementing the golden oracle
tests which pin one dataset."""

from __future__ import annotations

from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
from tests.conftest import SF_DIR


def _run(spark, name):
    return REGISTRY[name].spark(spark, SF_DIR)


def test_packing_conserves_tokens(spark, tables):
    """Σ block_tokens == Σ per-doc tokens — packing may never drop or
    duplicate a token."""
    blocks = _run(spark, "pack_documents_blocks")
    total_in = (
        tables["documents"]
        .select(
            F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    total_out = blocks.agg(F.sum("block_tokens")).collect()[0][0]
    assert total_in == total_out


def test_packing_blocks_are_contiguous(spark):
    """Doc-id ranges of consecutive blocks must not overlap (stable order)."""
    rows = sorted(
        _run(spark, "pack_documents_blocks").collect(), key=lambda r: r.block_id
    )
    for prev, cur in zip(rows, rows[1:]):
        assert prev.last_doc < cur.first_doc


def test_split_assignment_is_exhaustive_and_disjoint(spark, tables):
    """Every doc lands in exactly one split; fractions are in sane bands
    (hash buckets: ~80/10/10 with small-sample noise)."""
    out = _run(spark, "split_assign_documents").collect()
    n_total = tables["documents"].count()
    per_split: dict[str, int] = {}
    for r in out:
        per_split[r.split] = per_split.get(r.split, 0) + r.n
    assert sum(per_split.values()) == n_total
    assert set(per_split) == {"train", "val", "test"}
    assert 0.70 <= per_split["train"] / n_total <= 0.90


def test_hash_sample_is_stable_subset(spark, tables):
    """Sampling twice gives the identical subset (no RNG state), and every
    sampled id exists in the input."""
    a = {r.doc_id for r in _run(spark, "hash_sample_documents").collect()}
    b = {r.doc_id for r in _run(spark, "hash_sample_documents").collect()}
    assert a == b
    all_ids = {r.doc_id for r in tables["documents"].select("doc_id").collect()}
    assert a <= all_ids


def test_quantized_vectors_bounded_and_shaped(spark, tables):
    """int8 range respected; one quantized vector per input vector, same
    dimensionality."""
    out = _run(spark, "quantize_embeddings_int8")
    n_in = tables["embeddings"].count()
    # the registry's output contract stringifies arrays (no ArrayType in
    # final schemas — tests/test_output_contract.py); re-split for the
    # numeric bound checks
    arr = F.transform(
        F.split("qvec", ","), lambda x: x.cast("int")
    )
    stats = out.select(
        F.count("*").alias("n"),
        F.min(F.array_min(arr)).alias("lo"),
        F.max(F.array_max(arr)).alias("hi"),
        F.min(F.size(arr)).alias("dmin"),
        F.max(F.size(arr)).alias("dmax"),
    ).collect()[0]
    assert stats.n == n_in
    assert stats.lo >= -127 and stats.hi <= 127
    assert stats.dmin == stats.dmax == 64


def test_snapshot_merge_keeps_one_row_per_key(spark, tables):
    out = _run(spark, "snapshot_merge_orders")
    n_orders = tables["orders"].count()
    assert out.count() == n_orders
    assert out.select("o_orderkey").distinct().count() == n_orders
    # every delta key must surface the v2 row
    n_delta = out.filter(F.col("version") == 2).count()
    n_expected = tables["orders"].filter(F.col("o_orderkey") % 10 == 0).count()
    assert n_delta == n_expected


def test_length_band_within_bounds(spark, tables):
    """Band filter output is a subset with ≥ ~90% of rows retained (p05–p95)."""
    kept = _run(spark, "length_band_documents").count()
    total = tables["documents"].count()
    assert 0.85 <= kept / total <= 0.95


def test_transition_counts_conserve_rows(spark, tables):
    """Σ transitions = Σ (rows_per_user - 1): lead() emits exactly one
    transition per consecutive pair."""
    out = _run(spark, "transition_counts_events")
    total_trans = out.agg(F.sum("n")).collect()[0][0]
    ev = tables["events"]
    n_rows = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total_trans == n_rows - n_users


def test_funnel_is_monotone(spark):
    """Each funnel stage can only shrink: view ≥ view→click ≥ view→click→purchase."""
    row = _run(spark, "funnel_events").collect()[0]
    assert row.n_view >= row.n_view_click >= row.n_view_click_purchase >= 0


def test_user_growth_is_consistent(spark, tables):
    """cum_users is the running sum of n_new and ends at the total user count."""
    rows = sorted(_run(spark, "user_growth_daily").collect(), key=lambda r: r.day)
    running = 0
    for r in rows:
        running += r.n_new
        assert r.cum_users == running
    assert running == tables["events"].select("user_id").distinct().count()


def test_bm25_ranks_are_dense_and_scored(spark):
    """Ranks 1..k with no gaps; scores non-increasing along the ranking."""
    rows = sorted(_run(spark, "bm25_search_documents").collect(), key=lambda r: r.rnk)
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert prev.score >= cur.score


def test_density_clusters_respect_min_pts_and_noise(spark):
    """Every non-noise cluster has ≥ min_pts members and is labeled by its
    minimum member id; noise rows (−1) get empty similar-item lists."""
    from qa_data_pipeline_rag_llm_spark.plans.queries_vector import DENSITY_MIN_PTS

    rows = _run(spark, "density_clusters_embeddings").collect()
    by_label: dict[int, list[int]] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r.vec_id)
    for label, members in by_label.items():
        if label == -1:
            continue
        assert len(members) >= DENSITY_MIN_PTS
        assert label == min(members)
    sim = _run(spark, "density_similar_items").collect()
    for r in sim:
        if r.label == -1:
            assert r.similar_ids == ""
        else:
            assert str(r.vec_id) not in r.similar_ids.split(",")


def test_incremental_dedup_is_new_side_only(spark, tables):
    """Every flagged doc is from the NEW batch (odd source number), and its
    pairs are a subset of the full near-dup relation restricted to
    new×historical."""
    inc = {r.doc_id: r for r in _run(spark, "incremental_dedup_new_batch").collect()}
    parity = {
        r.doc_id: int(r.source[3:]) % 2
        for r in tables["documents"].select("doc_id", "source").collect()
    }
    assert all(parity[d] == 1 for d in inc)
    full = _run(spark, "minhash_near_dups").collect()
    cross_pairs = [
        r
        for r in full
        if parity[r.doc_a] != parity[r.doc_b]
    ]
    flagged_from_full = {
        (r.doc_a if parity[r.doc_a] == 1 else r.doc_b) for r in cross_pairs
    }
    # full near-dups require doc_a < doc_b; incremental has no order
    # constraint, so it can only find MORE new-side docs, never fewer
    assert flagged_from_full <= set(inc)


def test_near_dup_prune_keeps_exactly_one_per_cluster(spark):
    rows = _run(spark, "near_dup_prune_documents").collect()
    kept_per_cluster: dict[int, int] = {}
    for r in rows:
        kept_per_cluster.setdefault(r.cluster_id, 0)
        if r.kept:
            kept_per_cluster[r.cluster_id] += 1
            assert r.doc_id == r.cluster_id  # canonical = min = label
    assert all(n == 1 for n in kept_per_cluster.values())


def test_retention_cohort_offsets_start_at_zero(spark):
    """Every cohort has a week-0 row (the week its users first appeared)."""
    rows = _run(spark, "retention_cohorts_events").collect()
    cohorts = {r.cohort_wk for r in rows}
    zero_offset = {r.cohort_wk for r in rows if r.week_offset == 0}
    assert cohorts == zero_offset
    assert all(r.week_offset >= 0 for r in rows)


def test_span_dup_fraction_bounds_and_coverage(spark, tables):
    """Every doc gets a row; dup_spans ≤ n_spans; the flag replays the
    threshold on the emitted (rounded) fraction."""
    from qa_data_pipeline_rag_llm_spark.plans.queries_curation import SPAN_DUP_T

    rows = _run(spark, "span_dup_fraction_documents").collect()
    assert len(rows) == tables["documents"].count()
    for r in rows:
        assert 0 < r.n_spans
        assert 0 <= r.dup_spans <= r.n_spans
        assert 0.0 <= r.dup_frac <= 1.0
        assert r.flagged == (r.dup_frac > SPAN_DUP_T)


def test_gopher_keep_is_conjunction_of_rules(spark, tables):
    rows = _run(spark, "gopher_quality_documents").collect()
    assert len(rows) == tables["documents"].count()
    for r in rows:
        assert r.keep == (
            r.pass_len
            and r.pass_word_len
            and r.pass_symbol
            and r.pass_alpha
            and r.pass_stop
        )
        assert 0.0 <= r.symbol_frac <= 1.0
        assert 0.0 <= r.alpha_word_frac <= 1.0


def test_knn_purity_shape_and_bounds(spark):
    from qa_data_pipeline_rag_llm_spark.plans.queries_curation import (
        KNN_K,
        KNN_PROBES,
    )

    rows = _run(spark, "knn_label_purity_embeddings").collect()
    assert len(rows) == KNN_PROBES
    for r in rows:
        assert r.k_eff == KNN_K
        assert 0 <= r.n_same <= r.k_eff
        assert abs(r.purity - r.n_same / r.k_eff) < 1e-6


def test_mixture_weights_rebalance_to_uniform(spark, tables):
    """Shares sum to 1; applying the weight moves every source to the
    uniform target budget (within emitted rounding)."""
    rows = _run(spark, "mixture_weights_by_source").collect()
    n_src = tables["documents"].select("source").distinct().count()
    assert len(rows) == n_src
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.sample_weight > 0
        assert abs(r.sample_weight * r.bpe_tokens - r.target_tokens) <= max(
            1.0, 1e-4 * r.target_tokens
        )
