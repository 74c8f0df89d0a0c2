"""Similarity search over embedding columns (M4, S7) + embedding near-dup.

The reference's vector path is an external Qdrant index searched top-1
(``/root/reference/app2.py:32-45``, ``PLATFORM-contextual-Chunking.py:
137-174``). Here vectors are a Parquet ``array<float>`` column and
similarity is relational:

  * brute-force cosine top-k — the exact baseline; a rank over one
    zip_with/aggregate projection, fully distributed, no index.
  * sign-random-projection LSH — the scale path: 16 deterministic
    hyperplanes (weights derived from md5 so the DuckDB oracle can replay
    them), bucket by signature band, rank only within colliding buckets.

At 100 TB the brute-force path is a broadcast of the (small) probe set
against a full scan — linear, shuffle-free; the LSH path cuts the scanned
candidate set by orders of magnitude at recall < 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.hashing import stable_int32
from qa_data_pipeline_rag_llm_spark.functions.vectors import dot, norm, safe_denom


def cosine_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    num_salts: int = 16,
) -> DataFrame:
    """Exact top-k cosine neighbors for every probe row.

    ``probes`` is expected to be small — it is broadcast, so the candidate
    scan never shuffles; only the per-probe top-k rank does.

    Norms are folded ONCE per side before the pair join (higher-order
    functions are interpreted, not codegen'd — per-pair norm folds were
    the dominant cost); the double result is bit-identical because the
    fold itself is unchanged, only its multiplicity.

    The per-probe rank runs as ``operators/ranking.salted_top_k``
    (review r03): a window partitioned by probe_id alone serializes the
    WHOLE candidate frame through one task per probe — with a single
    probe that is the corpus-sized single-partition window of VERDICT
    r02 #1. The two-phase form is value-identical.
    """
    from qa_data_pipeline_rag_llm_spark.operators.ranking import (
        salted_top_k,
    )

    # name-path dot/norm (r13): one parsed expression per fold instead of
    # py4j lambda construction — bit-identical results, see functions/vectors
    v = vectors.withColumn("_vn", norm(vec_col))
    p = probes.withColumn("_pn", norm(probe_vec))
    scored = v.join(F.broadcast(p)).filter(
        F.col(id_col) != F.col(probe_id)
    ).select(
        F.col(probe_id),
        F.col(id_col),
        F.round(
            dot(vec_col, probe_vec)
            / safe_denom(F.col("_vn") * F.col("_pn")),
            6,
        ).alias("sim"),
    )
    return salted_top_k(
        scored,
        [probe_id],
        [F.desc("sim"), F.col(id_col)],
        k,
        salt_col=id_col,
        num_salts=num_salts,
    ).select(probe_id, id_col, "sim", "rank")


def hyperplane_weights(dims: int, planes: int) -> list[list[float]]:
    """Deterministic hyperplane weights, computed driver-side (tiny):
    w(p,d) = hexval(md5('p,d')[:8]) / 2^31 − 1 ∈ [−1, 1). Exactly
    representable doubles, so SQL literals replay them bit-for-bit."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[:8], 16) / 2**31 - 1.0
            for d in range(dims)
        ]
        for p in range(planes)
    ]


def srp_signatures(
    vectors: DataFrame,
    planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Sign-random-projection signature per vector: (id, sig) with
    sig = Σ_p 2^p · [Σ_d vec[d]·w(p,d) > 0].

    Each projection is an index-order fold over the vector against a
    literal weight array — a deterministic double sum (explode+groupBy
    would sum in shuffle order, which is not reproducible), inlined into
    one codegen'd projection with zero shuffles.

    ``dims`` must be passed by any caller that composes this into a
    larger plan: array length is not part of Spark's schema, so without
    it the only option is a driver-side ``first()`` probe — a Spark
    ACTION during plan construction, re-paid on every call (VERDICT r01).
    The probe remains solely as an interactive-use fallback.
    """
    if dims is None:
        dims = len(vectors.select(vec_col).first()[0])
    weights = hyperplane_weights(dims, planes)
    # r12: the whole signature is ONE parsed SQL expression instead of
    # planes × (per-element F.lit array + two Python lambdas). Each
    # F.lit/lambda is a py4j round trip, so the old construction cost
    # ~8.5 s of DRIVER time per call at 32 planes × 64 dims — more than
    # the queries it feeds spent executing. One F.expr parse is ~10 ms.
    # The parsed tree is the same Catalyst expression (zip_with +
    # aggregate fold, repr'd double literals round-trip exactly), so
    # signatures are bit-identical (A/B'd at sf0.1; oracle unchanged).
    terms = []
    for p in range(planes):
        # float(x)!r, matching ivf._dot_lit_sql (ADVICE r12): a numpy
        # scalar reprs as 'np.float64(…)' under NumPy 2 and would parse
        # to NULL/error; float() normalizes without changing the value
        arr = (
            "array("
            + ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in weights[p])
            + ")"
        )
        proj = (
            f"aggregate(zip_with(`{vec_col}`, {arr}, "
            "(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), "
            "(acc, v) -> acc + v)"
        )
        terms.append(
            f"(CASE WHEN {proj} > 0 THEN CAST({2 ** p} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END)"
        )
    return vectors.select(
        F.col(id_col), F.expr(" + ".join(terms)).alias("sig")
    )


def embedding_near_dup(
    vectors: DataFrame,
    planes: int = 16,
    cosine_threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    sig: DataFrame | None = None,
    kernel: str = "fold",
) -> DataFrame:
    """Near-duplicate vector pairs: SRP-signature collision (exact match on
    all ``planes`` bits) → verify cosine ≥ threshold. (doc pairs + sim).

    ``sig`` lets a caller that already computed srp_signatures share it
    instead of paying the 2^planes projection fold over the corpus twice
    (semantic_dedup did exactly that pre-r03 — review).

    ``kernel`` picks the verification arithmetic: ``'fold'`` (default)
    is the higher-order-function fold — sequential, hash-exact against
    DuckDB's ``list_dot_product``, what every registry oracle assumes —
    and ``'arrow'`` is the vectorized numpy kernel for production pair
    volumes (Spark never codegens HOFs, so the fold runs interpreted
    per element: ~11× slower at sf≈1's 12.8M candidate pairs, r10 A/B
    in SCALING.md; verdicts agreed pair-for-pair there, but pairwise
    summation is not ulp-identical to the fold, so the fast kernel is
    not oracle-grade by construction)."""
    if sig is None:
        sig = srp_signatures(vectors, planes, id_col, vec_col, dims=dims)
    if kernel == "arrow":
        from qa_data_pipeline_rag_llm_spark.functions.vectors import (
            arrow_cosine_udf,
        )

        cos = arrow_cosine_udf()
        v = vectors.join(sig, id_col)
        pairs = (
            v.alias("a")
            .join(v.alias("b"), "sig")
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.round(
                    cos(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
                ).alias("sim"),
            )
        )
        return pairs.filter(F.col("sim") >= cosine_threshold)
    v = vectors.join(sig, id_col).withColumn("_n", norm(vec_col))
    pairs = (
        v.alias("a")
        .join(v.alias("b"), "sig")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                dot(f"a.{vec_col}", f"b.{vec_col}")
                / safe_denom(F.col("a._n") * F.col("b._n")),
                6,
            ).alias("sim"),
        )
    )
    return pairs.filter(F.col("sim") >= cosine_threshold)


def semantic_dedup(
    vectors: DataFrame,
    planes: int = 4,
    cosine_threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    kernel: str = "fold",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 shape:
    cluster, then drop all-but-one of each within-cluster ε-ball).

    The corpus is partitioned into deterministic angular cells (SRP-LSH
    orthants — the zero-RNG stand-in for SemDeDup's k-means step), then a
    vector is DROPPED iff some higher-priority member of its cell (lower
    id — the keeper-priority proxy for SemDeDup's "closest to centroid")
    has exact cosine ≥ ``cosine_threshold`` with it. Returns every input
    row as (id, cell, kept) so the caller can filter or audit.

    Non-greedy relaxation, documented: priority is the global id order,
    not prefix-dependent greedy suppression (which is order-sequential,
    unscalable, and not SQL-expressible); the relaxation can only
    over-prune, never under-prune.

    Scale: cell assignment is a map-only projection; the pair join
    shuffles on the cell key and generates candidates only within cells
    (n²/cells bound — pick ``planes`` so cells stay executor-sized at the
    target corpus; at 100 TB that is 16+ planes, not the toy 4 here) and
    ``kernel='arrow'`` swaps the interpreted HOF cosine for the numpy
    verification kernel (~11× at sf≈1; see embedding_near_dup — the
    fold default stays because it is the oracle-exact arithmetic).
    Reference parity: the reference's only semantic grouping is HDBSCAN →
    similar-posts (PLATFORM-contextual-Chunking.py:83-113); this is the
    training-data extension of that surface.
    """
    # one copy of the candidate-pair pipeline: a DROPPED id is exactly an
    # id_b of some qualifying near-dup pair (ADVICE r02 — was a line-for-
    # line duplicate of embedding_near_dup's sig-join/cosine-filter)
    sig = srp_signatures(vectors, planes, id_col, vec_col, dims=dims)
    dup_ids = (
        embedding_near_dup(
            vectors, planes, cosine_threshold, id_col, vec_col,
            dims=dims, sig=sig, kernel=kernel,
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    dup_marked = dup_ids.withColumn("_dup_id", F.col(id_col))
    return (
        vectors.join(sig, id_col)
        .join(dup_marked, id_col, "left")
        .select(
            id_col,
            F.col("sig").alias("cell"),
            # kept iff no dup row matched — mirrors the oracle's IS NULL
            F.col("_dup_id").isNull().alias("kept"),
        )
    )


def ann_lsh_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int = 5,
    planes: int = 16,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    dims: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing ≥1 signature band
    with the probe, then exact cosine rank within candidates."""
    sig_v = srp_signatures(vectors, planes, id_col, vec_col, dims=dims)
    sig_p = srp_signatures(
        probes.select(
            F.col(probe_id).alias(id_col), F.col(probe_vec).alias(vec_col)
        ),
        planes,
        id_col,
        vec_col,
        dims=dims,
    ).select(F.col(id_col).alias(probe_id), F.col("sig").alias("psig"))

    nbands = planes // band_bits
    mask = (1 << band_bits) - 1

    def bands(sig_col: str, out: str) -> list:
        return [
            F.shiftright(F.col(sig_col), b * band_bits)
            .bitwiseAND(F.lit(mask))
            .alias(f"{out}{b}")
            for b in range(nbands)
        ]

    v = vectors.join(sig_v, id_col).select(
        id_col, vec_col, norm(vec_col).alias("_vn"), *bands("sig", "vb")
    )
    p = probes.join(F.broadcast(sig_p), probe_id).select(
        probe_id, probe_vec, norm(probe_vec).alias("_pn"), *bands("psig", "pb")
    )
    band_match = None
    for b in range(nbands):
        cond = F.col(f"vb{b}") == F.col(f"pb{b}")
        band_match = cond if band_match is None else (band_match | cond)
    cand = v.join(F.broadcast(p), band_match & (F.col(id_col) != F.col(probe_id)))
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
