"""MMR result diversification — the serving-side re-rank the reference lacks.

The reference returns the raw cosine top-1 (``/root/reference/app2.py:32-45``);
production RAG serving re-ranks a bounded candidate list so the context
window isn't filled with near-duplicates of the same passage. Maximal
Marginal Relevance (Carbonell & Goldstein 1998) is the standard form:

    pick argmax_c  lam * rel(c)  -  (1 - lam) * max_{s in S} sim(c, s)

iterated k times over a candidate set of ``depth`` rows per query.

Determinism contract: relevance and pairwise similarities enter as
SCALED INTEGERS (round(cos * 1e6) as long), and the greedy objective is
pure integer arithmetic (``lam_num * rel_s - dissim_num * maxsim_s``), so
the selection sequence is bit-identical in Spark, the pandas kernel, and
the DuckDB recursive-CTE oracle — no float comparison anywhere. Ties
break on the smaller doc id.

Scale notes (100 TB): the greedy step is inherently sequential in k but
bounded — each group is one query's ``depth x (depth-1)`` pair rows
(a few KB), so ``applyInPandas`` grouped by query id distributes the
re-rank linearly across the query batch while the corpus-sized work
(candidate generation) stays in the exact/ANN retrievers upstream
(`operators/similarity.py`, `operators/ivf.py`).
"""

from __future__ import annotations

import sys

import pandas as pd

from pyspark import cloudpickle
from pyspark.sql import DataFrame

# The grouped-map kernel closes over this module's globals; serialize the
# module BY VALUE so Python workers never need the repo on their path
# (the driver's plain session imports via sys.path, which workers don't
# inherit — same pattern as operators/grouped.py).
cloudpickle.register_pickle_by_value(sys.modules[__name__])

MMR_OUT_SCHEMA = "probe_id long, rnk int, doc_id long, mmr_s long"


def _mmr_greedy_group(pdf: pd.DataFrame, k: int, lam_num: int, dissim_num: int) -> pd.DataFrame:
    """Greedy MMR over ONE query's candidate pairs (integer-exact).

    ``pdf`` columns: probe_id, i (candidate doc), rel_s (scaled relevance
    of i), j (other candidate, NULL when i is the probe's only
    candidate), sim_s (scaled sim(i, j), NULL with j). The candidate
    universe comes from the (i, rel_s) rows, NOT from the pairs — a
    probe whose top-depth set has exactly one doc still emits its rank-1
    row (advice r04). Callers must pre-drop NULL rel_s/sim_s scores
    (zero-norm embeddings) — see mmr_rerank.
    """
    probe_id = int(pdf["probe_id"].iloc[0])
    rel = (
        pdf[["i", "rel_s"]]
        .drop_duplicates("i")
        .set_index("i")["rel_s"]
        .astype("int64")
        .to_dict()
    )
    with_pairs = pdf.dropna(subset=["j", "sim_s"])
    sim: dict[tuple[int, int], int] = {
        (int(r.i), int(r.j)): int(r.sim_s) for r in with_pairs.itertuples()
    }
    remaining = set(rel)
    picked: list[int] = []
    out: list[tuple[int, int, int, int]] = []
    for step in range(1, min(k, len(rel)) + 1):
        # max sim to the picked set; 0 for the first pick (empty set)
        best_doc, best_score = None, None
        for c in sorted(remaining):
            maxsim = max((sim[(c, s)] for s in picked), default=0)
            score = lam_num * rel[c] - dissim_num * maxsim
            if best_score is None or score > best_score:
                best_doc, best_score = c, score
        picked.append(best_doc)
        remaining.discard(best_doc)
        out.append((probe_id, step, best_doc, best_score))
    return pd.DataFrame(out, columns=["probe_id", "rnk", "doc_id", "mmr_s"])


def mmr_rerank(
    cand: DataFrame,
    pairs: DataFrame,
    k: int,
    lam_num: int = 7,
    dissim_num: int = 3,
) -> DataFrame:
    """Diversified top-k per query from a bounded candidate frame.

    ``cand`` columns: ``probe_id`` (query id), ``i`` (candidate doc id),
    ``rel_s`` (scaled-int relevance of ``i``). ``pairs`` columns:
    ``probe_id``, ``i``, ``j`` (other candidate), ``sim_s`` (scaled-int
    sim(i, j)). The kernel's candidate universe is ``cand`` left-joined
    with ``pairs`` (advice r04): a probe with a single candidate has no
    pairs but still emits its rank-1 row, matching the oracle's
    recursive base case. One group per query — pair counts are
    depth^2-bounded upstream, so each group is tiny regardless of
    corpus size.

    NULL guards: rows whose scores are NULL (a zero-norm embedding makes
    the cosine's nullif denominator yield NULL) are DROPPED before the
    kernel — the integer kernel cannot represent them, and both engines
    exclude zero-norm vectors from the candidate set by the same rule.
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _mmr_greedy_group(pdf, k, lam_num, dissim_num)

    from pyspark.sql import functions as F

    c = cand.filter(F.col("rel_s").isNotNull())
    p = pairs.filter(F.col("sim_s").isNotNull())
    joined = c.join(p, ["probe_id", "i"], "left")
    return joined.groupBy("probe_id").applyInPandas(kernel, MMR_OUT_SCHEMA)
