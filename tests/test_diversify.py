"""MMR diversification kernel: known-answer, tie-break, diversity property."""

from __future__ import annotations

import pandas as pd

from qa_data_pipeline_rag_llm_spark.operators.diversify import (
    _mmr_greedy_group,
    mmr_rerank,
)


def _pairs_frame(probe_id, rel, sim):
    """Build the operator's input rows from rel {doc: rel_s} and
    symmetric sim {(i, j): sim_s}."""
    rows = []
    for i in rel:
        for j in rel:
            if i != j:
                s = sim.get((i, j), sim.get((j, i), 0))
                rows.append((probe_id, i, rel[i], j, s))
    return pd.DataFrame(rows, columns=["probe_id", "i", "rel_s", "j", "sim_s"])


def test_mmr_skips_near_duplicate_of_first_pick():
    # doc 2 is nearly identical to doc 1 (sim .99) and slightly less
    # relevant; pure relevance ranks it 2nd, MMR must demote it below
    # the dissimilar doc 3.
    rel = {1: 1_000_000, 2: 990_000, 3: 800_000}
    sim = {(1, 2): 990_000, (1, 3): 100_000, (2, 3): 120_000}
    out = _mmr_greedy_group(_pairs_frame(7, rel, sim), k=3, lam_num=7, dissim_num=3)
    assert list(out["doc_id"]) == [1, 3, 2]
    assert list(out["rnk"]) == [1, 2, 3]
    # scores are exact integers: step1 = 7*rel, later = 7*rel - 3*maxsim
    assert out["mmr_s"].tolist() == [
        7 * 1_000_000,
        7 * 800_000 - 3 * 100_000,
        7 * 990_000 - 3 * 990_000,
    ]


def test_mmr_tie_breaks_on_smaller_doc_id():
    rel = {5: 900_000, 9: 900_000, 1: 1_000_000}
    # both 5 and 9 equally dissimilar to 1 → identical objective at
    # step 2; the smaller id must win (oracle ORDER BY mmr_s DESC, doc_id)
    sim = {(1, 5): 200_000, (1, 9): 200_000, (5, 9): 0}
    out = _mmr_greedy_group(_pairs_frame(0, rel, sim), k=2, lam_num=7, dissim_num=3)
    assert list(out["doc_id"]) == [1, 5]


def test_mmr_matches_bruteforce_reference(spark):
    """Distributed operator ≡ an independent brute-force greedy."""
    import itertools

    rel = {10: 500_000, 11: 480_000, 12: 470_000, 13: 100_000}
    sim = {
        (10, 11): 450_000,
        (10, 12): 440_000,
        (11, 12): 460_000,
        (10, 13): 10_000,
        (11, 13): 20_000,
        (12, 13): 30_000,
    }

    def brute(k):
        picked, out = [], []
        remaining = sorted(rel)
        while remaining and len(out) < k:
            best = None
            for c in remaining:
                ms = max(
                    (sim.get((c, s), sim.get((s, c), 0)) for s in picked),
                    default=0,
                )
                score = 7 * rel[c] - 3 * ms
                if best is None or score > best[1] or (score == best[1] and c < best[0]):
                    best = (c, score)
            picked.append(best[0])
            remaining.remove(best[0])
            out.append(best)
        return out

    pdf = _pairs_frame(3, rel, sim)
    cand = spark.createDataFrame(
        pdf[["probe_id", "i", "rel_s"]].drop_duplicates()
    )
    pairs = spark.createDataFrame(pdf[["probe_id", "i", "j", "sim_s"]])
    got = (
        mmr_rerank(cand, pairs, k=4)
        .orderBy("rnk")
        .select("doc_id", "mmr_s")
        .collect()
    )
    assert [(r.doc_id, r.mmr_s) for r in got] == brute(4)


def test_mmr_single_candidate_probe_survives(spark):
    """A probe whose top-depth set has exactly ONE doc produces zero
    pairs but must still emit its rank-1 row (advice r04) — matching
    the oracle's recursive base case, which is built from cand."""
    cand = spark.createDataFrame(
        [(1, 42, 900_000)], ["probe_id", "i", "rel_s"]
    )
    pairs = spark.createDataFrame(
        [], "probe_id long, i long, j long, sim_s long"
    )
    got = mmr_rerank(cand, pairs, k=3).collect()
    assert [(r.probe_id, r.rnk, r.doc_id, r.mmr_s) for r in got] == [
        (1, 1, 42, 7 * 900_000)
    ]


def test_mmr_null_scores_are_dropped(spark):
    """Zero-norm embeddings yield NULL scaled scores; the kernel must
    never see them (advice r04) — NULL rel_s candidates are excluded,
    NULL sim_s pairs ignored, and the remaining rows rank normally."""
    cand = spark.createDataFrame(
        [(1, 10, 500_000), (1, 11, None), (1, 12, 400_000)],
        "probe_id long, i long, rel_s long",
    )
    pairs = spark.createDataFrame(
        [(1, 10, 12, 100_000), (1, 12, 10, 100_000), (1, 10, 11, None)],
        "probe_id long, i long, j long, sim_s long",
    )
    got = mmr_rerank(cand, pairs, k=3).orderBy("rnk").collect()
    assert [r.doc_id for r in got] == [10, 12]


def test_mmr_degenerate_cases_hash_match_oracle(spark, tmp_path):
    """VERDICT r05 ask #6: the advice-r04 degenerate cases — a probe
    with exactly ONE candidate and zero-norm-embedding candidates —
    verified END-TO-END: the registry query and its DuckDB oracle run
    on the same synthetic embeddings table and must agree exactly.

    Construction: probes are vec_ids (0,1,2). Vectors 1 and 2 are
    all-zero (zero norm -> NULL cosine on both engines), so probe 0's
    candidate set is exactly {3} (single candidate, no pairs) and
    probes 1/2 have NO candidates at all (they emit nothing)."""
    import duckdb

    from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY

    dim = 8
    rows = [
        (0, [1.0] + [0.0] * (dim - 1), 0),
        (1, [0.0] * dim, 0),  # zero-norm probe AND candidate
        (2, [0.0] * dim, 0),  # zero-norm probe AND candidate
        (3, [0.5] * dim, 1),  # the single real candidate
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )

    spec = REGISTRY["mmr_diversified_retrieval"]
    got = sorted(
        (r.probe_id, r.rnk, r.doc_id, r.mmr_s)
        for r in spec.spark(spark, str(tmp_path)).collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(spec.oracle).fetchall()))

    assert got == want
    # the single-candidate probe emits exactly its rank-1 row; the
    # zero-norm probes emit nothing
    assert [t[:3] for t in got] == [(0, 1, 3)]
