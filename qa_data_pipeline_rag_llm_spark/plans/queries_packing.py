"""Registry entries: vector quantization, sequence packing, and the last
set-operation/cartesian gaps.

Quantization and packing are training-data ops the reference never had
(its vector handling ends at float32 upsert — SURVEY.md K3/M1): int8
scalar quantization is how production vector stores shrink embeddings 4×,
and block packing is the standard pre-tokenization step that tiles
documents into fixed-token training sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register

BLOCK_TOKENS = 2048


# Native-array quantizer SQL: reused as a CTE by ann_sq8_refine_topk
# (which needs the real INT[] for list_dot_product); the REGISTERED
# oracle below stringifies the final projection (driver output contract:
# no ArrayType in result schemas — the driver canonicalizer lexsorts
# rows in pandas and cannot hash ndarray cells).
_O_QVEC_NATIVE = """
    WITH flat AS (
      SELECT vec_id,
             unnest(generate_series(1, len(embedding))) AS pos,
             unnest(embedding) AS val
      FROM embeddings
    ), bounds AS (
      SELECT pos, min(val) AS mn, max(val) AS mx FROM flat GROUP BY pos
    ), q AS (
      SELECT f.vec_id, f.pos,
             CASE WHEN b.mx > b.mn THEN
               CAST(round((CAST(f.val AS DOUBLE) - CAST(b.mn AS DOUBLE))
                          / (CAST(b.mx AS DOUBLE) - CAST(b.mn AS DOUBLE))
                          * 254.0 - 127.0) AS INT)
             ELSE 0 END AS qv
      FROM flat f JOIN bounds b USING (pos))
    SELECT vec_id, array_agg(qv ORDER BY pos) AS qvec
    FROM q GROUP BY vec_id
"""


@register(
    "quantize_embeddings_int8",
    f"""
    SELECT vec_id, array_to_string(qvec, ',') AS qvec
    FROM ({_O_QVEC_NATIVE})
    """,
    doc="Int8 scalar quantization of the embedding column (per-dimension "
    "min/max affine map to [-127, 127]): the 4× compression step before "
    "ANN serving. The tiny per-dimension bounds table is broadcast back "
    "over the flattened scan; vectors are reassembled position-ordered so "
    "the output array is deterministic. The registered query stringifies "
    "the final qvec (driver output contract); ann_sq8_refine_topk consumes "
    "the native-array form via _quantize_int8_native.",
)
def quantize_embeddings_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    qv = _quantize_int8_native(spark, sf_dir)
    return qv.select(
        "vec_id",
        F.array_join(
            F.transform("qvec", lambda x: x.cast("string")), ","
        ).alias("qvec"),
    )


def _quantize_int8_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantizer returning the native array<int> qvec (internal)."""
    emb = _t(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "val")
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "val")
    bounds = flat.groupBy("pos").agg(
        F.min("val").alias("mn"), F.max("val").alias("mx")
    )
    qv = F.when(
        F.col("mx") > F.col("mn"),
        F.round(
            (F.col("val").cast("double") - F.col("mn").cast("double"))
            / (F.col("mx").cast("double") - F.col("mn").cast("double"))
            * 254.0
            - 127.0
        ).cast("int"),
    ).otherwise(F.lit(0))
    q = flat.join(F.broadcast(bounds), "pos").select(
        "vec_id", "pos", qv.alias("qv")
    )
    return q.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "qv"))),
            lambda x: x.qv,
        ).alias("qvec")
    )


@register(
    "pack_documents_blocks",
    f"""
    WITH toks AS (
      SELECT doc_id, len(string_split(coalesce(text, ''), ' ')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - n_tokens AS start_off
      FROM toks)
    SELECT CAST(start_off AS BIGINT) // {BLOCK_TOKENS} AS block_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS block_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM packed GROUP BY 1
    """,
    doc=f"Sequence packing: tile documents (in stable doc_id order) into "
    f"{BLOCK_TOKENS}-token training blocks via a running token offset — "
    "the pre-tokenization step that turns a corpus into fixed-length LLM "
    "training sequences. The running sum is a total-order window here "
    "(oracle parity); the 100 TB path packs per hash-shard — each shard "
    "packs independently in parallel, since blocks never need to cross "
    "shard boundaries.",
)
def pack_documents_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias(
            "n_tokens"
        ),
    )
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "start_off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        # floor division on longs — `/`+cast would round vs truncate
        # differently across engines at block boundaries
        packed.groupBy(
            F.expr(f"start_off div {BLOCK_TOKENS}").alias("block_id")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("block_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


PACK_SHARDS = 8


@register(
    "pack_documents_sharded",
    f"""
    WITH toks AS (
      SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
             len(string_split(coalesce(text, ''), ' ')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - n_tokens AS start_off
      FROM toks)
    SELECT shard * 17592186044416 + CAST(start_off AS BIGINT) // {BLOCK_TOKENS}
             AS block_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS block_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM packed GROUP BY 1
    """,
    doc="The 100 TB twin of pack_documents_blocks (VERDICT r02 #7): "
    f"documents shard by doc_id mod {PACK_SHARDS}, each shard packs its "
    f"own {BLOCK_TOKENS}-token blocks independently (running offset is a "
    "PARTITIONED window — one shuffle, S parallel sorts, no single-task "
    "total order), and block ids are globally unique by shard prefix. "
    "Blocks never cross shard boundaries, so the only difference from "
    "the exact form is WHICH docs share a block — per-block invariants "
    "and corpus totals are preserved (tests/test_scale_twins.py); with "
    "one shard the outputs are identical.",
)
def pack_documents_sharded(
    spark: SparkSession, sf_dir: str, shards: int = PACK_SHARDS
) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % shards).alias("shard"),
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias(
            "n_tokens"
        ),
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = toks.withColumn(
        "start_off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        packed.groupBy(
            (
                # shard stride 2^44 blocks ≈ 3.6e16 tokens/shard before any
                # cross-shard id collision — comfortably past the 100 TB
                # target (1e6 collided at ~2e9 tokens/shard, review r03)
                F.col("shard") * F.lit(1 << 44)
                + F.expr(f"start_off div {BLOCK_TOKENS}")
            ).alias("block_id")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("block_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "cross_join_nation_region",
    """
    SELECT n_name, r_name FROM nation CROSS JOIN region
    """,
    doc="Explicit cartesian product (broadcast nested-loop join): the one "
    "join strategy the rest of the surface never exercises. Only ever "
    "sane when one side is tiny — Catalyst broadcasts the 5-row side.",
)
def cross_join_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return n.crossJoin(F.broadcast(r)).select("n_name", "r_name")


@register(
    "except_all_parts",
    """
    SELECT p_brand FROM (
      SELECT p_brand FROM part WHERE p_size >= 30
      EXCEPT ALL
      SELECT p_brand FROM part WHERE p_retailprice > 1500)
    """,
    doc="Multiset EXCEPT ALL (bag semantics — per-brand multiplicities "
    "subtract, unlike the DISTINCT set variant in intersect_except_parts).",
)
def except_all_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    a = p.filter(F.col("p_size") >= 30).select("p_brand")
    b = p.filter(F.col("p_retailprice") > 1500).select("p_brand")
    return a.exceptAll(b)


SQ8_PROBES = 5      # same deterministic probe set as cosine_topk
SQ8_CAND = 25       # coarse candidates per probe (int8 dot product)
SQ8_K = 5           # refined exact-cosine top-k


def _sq8_refine_sql() -> str:
    from qa_data_pipeline_rag_llm_spark.plans.queries_vector import _O_COS

    return f"""
    WITH qvec AS ({_O_QVEC_NATIVE}),
    coarse AS (
      SELECT pq.vec_id AS probe_id, eq.vec_id,
             list_dot_product(CAST(eq.qvec AS DOUBLE[]),
                              CAST(pq.qvec AS DOUBLE[])) AS qscore
      FROM qvec eq JOIN qvec pq
        ON pq.vec_id < {SQ8_PROBES} AND eq.vec_id != pq.vec_id),
    cand AS (
      SELECT probe_id, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                     ORDER BY qscore DESC, vec_id) AS crank
        FROM coarse) WHERE crank <= {SQ8_CAND}),
    refined AS (
      SELECT c.probe_id, c.vec_id, {_O_COS} AS sim
      FROM cand c
      JOIN embeddings e ON e.vec_id = c.vec_id
      JOIN embeddings p ON p.vec_id = c.probe_id)
    SELECT probe_id, vec_id, sim, CAST(rank AS INTEGER) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY sim DESC, vec_id) AS rank
      FROM refined) WHERE rank <= {SQ8_K}
    """


@register(
    "ann_sq8_refine_topk",
    None,  # injected below (composes the quantizer's oracle)
    doc="Two-stage ANN serving (the production SQ8 pattern): coarse scan "
    "scores int8-quantized vectors (4× less IO, integer dot products — "
    "exact in both engines), takes 5× over-fetched candidates, then "
    "re-ranks ONLY those with the exact double cosine. At 100 TB the "
    "qvec table is the materialized index the scan reads; the refine "
    "join touches k·probes full vectors. Deterministic ties at both "
    "stages.",
)
def ann_sq8_refine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from qa_data_pipeline_rag_llm_spark.functions.vectors import dot, norm, safe_denom

    qv = _quantize_int8_native(spark, sf_dir)
    probes_q = qv.filter(F.col("vec_id") < SQ8_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("qvec").alias("pqvec")
    )
    coarse = (
        qv.join(F.broadcast(probes_q), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            dot("qvec", "pqvec").alias("qscore"),
        )
    )
    wc = Window.partitionBy("probe_id").orderBy(F.desc("qscore"), "vec_id")
    cand = (
        coarse.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= SQ8_CAND)
        .select("probe_id", "vec_id")
    )
    emb = _t(spark, sf_dir, "embeddings")
    probes_full = emb.filter(F.col("vec_id") < SQ8_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pvec")
    )
    refined = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(probes_full), "probe_id")
        .select(
            "probe_id",
            "vec_id",
            F.round(
                dot("embedding", "pvec")
                / safe_denom(norm("embedding") * norm("pvec")),
                6,
            ).alias("sim"),
        )
    )
    wr = Window.partitionBy("probe_id").orderBy(F.desc("sim"), "vec_id")
    return (
        refined.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= SQ8_K)
        .select("probe_id", "vec_id", "sim", "rank")
    )


from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY  # noqa: E402

REGISTRY["ann_sq8_refine_topk"].oracle = _sq8_refine_sql()
