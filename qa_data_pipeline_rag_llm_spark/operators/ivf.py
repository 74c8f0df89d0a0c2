"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for M4 next to SRP-LSH (operators/similarity.py),
mirroring FAISS's IndexIVFFlat with METRIC_INNER_PRODUCT: a tiny coarse
quantizer partitions vectors into cells; a probe searches only its
``nprobe`` best cells, then exact-reranks within the candidates.

Spark-first shape, and why it survives 100 TB:

* Cell assignment is a ZERO-SHUFFLE projection. The coarse centroids are
  a bounded literal list (here: deterministic seed vectors; production
  would train them offline with KMeans and broadcast), so the argmax over
  ``k`` inner products inlines into whole-stage codegen — no window, no
  groupBy, no cross join against a centroid table.
* Probing broadcasts the (probe → cell) map; the only shuffle in the
  whole query is the final per-probe top-k rank.
* The candidate set shrinks by ~nprobe/n_cells versus the brute-force
  scan — the linear-scan rerank is on cells, not the corpus.

Determinism contract: inner products are index-order double folds
(bit-identical to DuckDB ``list_dot_product`` over ``DOUBLE[]`` casts —
probed 2026-08-13, see plans/queries_vector.py), argmax breaks ties
toward the smaller cell id (strict ``>`` fold in cid order), so the
whole IVF pipeline is oracle-checkable — unlike LSH-parameter recall,
nothing here is left to chance.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.vectors import dot, norm, safe_denom


def _dot_lit_sql(vec_col: str, weights: Sequence[float]) -> str:
    """SQL text for the index-order double fold of vec · literal-array.

    r12: built as ONE parser call instead of dims × F.lit + two Python
    lambdas — each of those is a py4j round trip, and the old per-element
    construction dominated the IVF queries' wall-clock (~3.5 s of DRIVER
    time per ann_ivf_topk build at 16 cells × 64 dims; the parsed tree is
    the same Catalyst expression, repr'd doubles round-trip exactly, so
    results are bit-identical)."""
    arr = (
        "array("
        + ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in weights)
        + ")"
    )
    return (
        f"aggregate(zip_with(`{vec_col}`, {arr}, "
        "(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), "
        "(acc, v) -> acc + v)"
    )


def _dot_lit(vec_col: str, weights: Sequence[float]) -> Column:
    """Index-order double fold of vec · literal-array (codegen'd, no UDF).
    ``vec_col`` is the COLUMN NAME (the fold is one parsed expression)."""
    return F.expr(_dot_lit_sql(vec_col, weights))


def seed_centroids(
    vectors: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: the vectors with the ``n_cells``
    smallest ids. Driver-side collect of a bounded tiny set (same pattern
    as similarity.hyperplane_weights); ``train_centroids_lloyd`` below is
    the offline-trained alternative for production scale — the plan
    shape downstream is unchanged (``ann_recall_ivf_trained`` measures
    the recall delta between the two)."""
    rows = (
        # orderBy+limit, not a value filter: `id < n_cells` returns zero
        # centroids (AttributeError downstream) for any id space that is
        # not dense-from-zero (review r03)
        vectors.orderBy(id_col)
        .limit(n_cells)
        .select(id_col, vec_col)
        .collect()
    )
    return sorted((r[0], list(r[1])) for r in rows)


def train_centroids_lloyd(
    vectors: DataFrame,
    n_cells: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """The offline-trained coarse quantizer ``seed_centroids``'s
    docstring promised (VERDICT r09 ask #6) — deterministic fixed-point
    Lloyd's, the same arithmetic as ``kmeans_fixedpoint_embeddings``
    (``plans/queries_graph_profile.py``) so the ENTIRE trainer stays
    DuckDB-twin-able: components translate to nonnegative integers
    ``v6 = round((v+1)·1e6)`` (translation preserves distances but keeps
    floor-division identical across engines), init = the ``n_cells``
    smallest-id vectors, per round an exact-integer squared-L2 argmin
    (ties → smaller cluster id) then an integer floor-average centroid
    update. Returns float centroids ``c6/1e6 − 1`` — identical IEEE
    doubles from identical integers in any engine.

    Scale shape: the loop is ``iters`` (small, fixed) rounds of one
    pos-join + two shuffles over the flattened corpus; only the final
    k×dims centroid table is collected (the bounded-driver-state
    pattern shared with ``seed_centroids``). An empty cluster simply
    drops out of the floor-average (GROUP BY semantics, mirrored by the
    SQL twin) and the index serves fewer cells."""
    flat = (
        vectors.select(id_col, F.posexplode(vec_col).alias("pos0", "val"))
        .select(
            F.col(id_col).alias("vid"),
            (F.col("pos0") + 1).alias("pos"),
            F.round((F.col("val").cast("double") + 1.0) * 1_000_000)
            .cast("long")
            .alias("v6"),
        )
        .persist()
    )
    seeds = (
        vectors.select(F.col(id_col).alias("vid")).orderBy("vid").limit(n_cells)
    )
    cents = flat.join(F.broadcast(seeds), "vid").select(
        F.col("vid").cast("int").alias("cluster"), "pos", F.col("v6").alias("c6")
    )

    def _assign(cents_df: DataFrame) -> DataFrame:
        dists = (
            flat.join(cents_df, "pos")
            .groupBy("vid", "cluster")
            .agg(
                F.sum(
                    (F.col("v6") - F.col("c6")) * (F.col("v6") - F.col("c6"))
                ).alias("dist")
            )
        )
        # lexicographic struct-min == (min dist, then min cluster id)
        return (
            dists.groupBy("vid")
            .agg(F.min(F.struct("dist", "cluster")).alias("m"))
            .select("vid", F.col("m.cluster").alias("cluster"))
        )

    try:
        for _ in range(iters):
            cents = (
                _assign(cents)
                .join(flat, "vid")
                .groupBy("cluster", "pos")
                .agg(F.expr("sum(v6) div count(*)").cast("long").alias("c6"))
                # materialize the tiny k×dims table per round (ADVICE
                # r10): lazily stacking rounds on the previous round's
                # unmaterialized plan grows lineage — and recomputation —
                # superlinearly in `iters`; a localCheckpoint truncates
                # it so raising `iters` stays linear
                .localCheckpoint(eager=True)
            )
        rows = cents.collect()
    finally:
        flat.unpersist()
    by_cluster: dict[int, dict[int, int]] = {}
    for r in rows:
        by_cluster.setdefault(int(r["cluster"]), {})[int(r["pos"])] = int(
            r["c6"]
        )
    return sorted(
        (cid, [dims[p] / 1_000_000.0 - 1.0 for p in sorted(dims)])
        for cid, dims in by_cluster.items()
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell): each vector goes to the centroid with the highest inner
    product (ties → smaller cell id). Pure projection — no shuffle.

    The ``n_cells`` dot products are materialized as columns FIRST, then the
    argmax folds over column references — keeping the expression tree linear
    in ``n_cells`` (folding over the raw dot expressions doubles the tree per
    step: 2^n nodes by 16 centroids, which stalls analysis/codegen).

    r12: the input is spread across cores first (guide §2.5 input skew —
    a single-file parquet scan plans as ONE task, and with no shuffle in
    this projection the n_cells × dims interpreted fold per row would
    all run on one core; measured 3.0 → 0.9 s on the sf0.1 seeded-IVF
    query)."""
    from qa_data_pipeline_rag_llm_spark.operators.util import (
        ensure_parallelism,
    )

    vectors = ensure_parallelism(vectors)
    dps = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        *[_dot_lit(vec_col, w).alias(f"_dp{cid}") for cid, w in centroids],
    )
    best_dp: Column | None = None
    best_cid: Column | None = None
    for cid, _ in centroids:  # increasing cid; strict > keeps the earliest
        dp = F.col(f"_dp{cid}")
        if best_dp is None:
            best_dp, best_cid = dp, F.lit(cid)
        else:
            best_cid = F.when(dp > best_dp, F.lit(cid)).otherwise(best_cid)
            best_dp = F.greatest(dp, best_dp)
    return dps.select(
        F.col(id_col), F.col(vec_col), best_cid.alias("cell")
    )


def ivf_probe_cells(
    probes: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    nprobe: int,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
) -> DataFrame:
    """(probe_id, cell): the ``nprobe`` best cells per probe. The probe set
    is small by contract; the explode + rank touches probes × n_cells rows."""
    pairs = F.expr(
        "array("
        + ", ".join(
            f"named_struct('cid', {int(cid)}, "
            f"'dp', {_dot_lit_sql(probe_vec, w)})"
            for cid, w in centroids
        )
        + ")"
    )
    exploded = probes.select(
        probe_id, F.explode(pairs).alias("c")
    ).select(probe_id, F.col("c.cid").alias("cell"), F.col("c.dp").alias("dp"))
    w_rank = Window.partitionBy(probe_id).orderBy(F.desc("dp"), F.col("cell"))
    return (
        exploded.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= nprobe)
        .select(probe_id, "cell")
    )


def ann_ivf_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    centroids: Sequence[tuple[int, Sequence[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k: scan only the probe's ``nprobe`` cells, exact
    cosine rerank within the candidates. ``centroids`` injects a
    trained coarse quantizer (``train_centroids_lloyd``); None keeps
    the cheap deterministic seeding."""
    if centroids is None:
        centroids = seed_centroids(vectors, n_cells, id_col, vec_col)
    assigned = ivf_assign(vectors, centroids, id_col, vec_col).withColumn(
        "_vn", norm(vec_col)
    )
    cells = ivf_probe_cells(probes, centroids, nprobe, probe_id, probe_vec)
    probe_full = probes.join(cells, probe_id).withColumn(
        "_pn", norm(probe_vec)
    )
    cand = assigned.join(
        F.broadcast(probe_full),
        (assigned["cell"] == probe_full["cell"])
        & (F.col(id_col) != F.col(probe_id)),
    )
    scored = cand.select(
        probe_id,
        id_col,
        F.round(
            dot(vec_col, probe_vec) / safe_denom(F.col("_vn") * F.col("_pn")), 6
        ).alias("sim"),
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, id_col, "sim", "rank")
    )
