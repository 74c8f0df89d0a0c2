"""Registry entries: embedding linear algebra, similarity-join physical
optimization, and seasonal anomaly detection.

None of these exist in the reference (its vector path stops at Qdrant
top-1 cosine, app2.py:133-247), but a 100 TB embedding corpus needs all
three:

  * ``gram_matrix_embeddings`` — the distributed Gram matrix X^T X of the
    embedding column: the input to PCA / whitening / low-rank projection
    of the vector store. The scale design is map-side reduction: each
    Arrow batch contributes ONE d(d+1)/2-row partial (a 64x64 integer
    matmul), so the shuffle is #batches x 2080 rows no matter how many
    vectors are scanned — the classic "computation tree sum of outer
    products" layout. Quantization (floor(x*1e6 + 0.5)) makes every
    partial an exact int64 and the DECIMAL(38,0) re-aggregate
    order-independent, so the result is hash-comparable with DuckDB's
    row-at-a-time replay.
  * ``prefix_filter_jaccard_pairs`` — exact set-similarity self-join with
    AllPairs/PPJoin prefix filtering (Bayardo et al., WWW'07): the
    inverted index is built only over each document's RAREST
    n - ceil(t*n) + 1 shingles (global (df, token) order), which is what
    keeps an exact-Jaccard join feasible when hot shingles would
    otherwise quadratically blow up the candidate pairs. The oracle is
    the UNOPTIMIZED any-shared-shingle join — proving the pruning loses
    no qualifying pair.
  * ``seasonal_anomalies_events`` — hour-of-week seasonal baseline over
    the event log with a leave-one-out 1.5x flag. All comparisons are
    cross-multiplied integers (no division in the predicate), so the
    flag set is exact; dow is epoch-day arithmetic ((d+4) % 7, 0=Sunday)
    rather than engine dayofweek(), whose numbering conventions differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.text import word_shingles
from qa_data_pipeline_rag_llm_spark.plans import oracle_fragments as O
from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register

#: embedding quantization scale: testdata vectors are in [-0.6, 0.6], so
#: |q| <= 6e5 and a per-batch int64 Gram entry is bounded by
#: rows_per_batch * 3.6e11 — safe for Arrow batches up to ~2.5e7 rows.
GRAM_SCALE = 1_000_000

#: prefix-filter shingle width / Jaccard threshold t = TN/TD = 0.5
PF_N = 5
PF_TN, PF_TD = 1, 2

#: seasonal flag: cnt >= 1.5x the leave-one-out slot mean (x10 fixed-point)
SEASONAL_THR_X10 = 15


def _gram_partials(batches):
    """Per-Arrow-batch partial Gram: one d(d+1)/2-row frame per batch.

    floor(x*1e6 + 0.5) (not rint/round) so the quantizer is the same
    IEEE double op sequence as the oracle's floor() — no half-even vs
    half-away divergence at exact .5 ties.
    """
    import numpy as np
    import pandas as pd

    for pdf in batches:
        if pdf.empty:
            continue
        V = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        Q = np.floor(V * float(GRAM_SCALE) + 0.5).astype("int64")
        G = Q.T @ Q
        iu, ju = np.triu_indices(G.shape[0])
        yield pd.DataFrame(
            {
                "i": (iu + 1).astype("int32"),
                "j": (ju + 1).astype("int32"),
                "part": G[iu, ju],
            }
        )


@register(
    "gram_matrix_embeddings",
    f"""
    WITH q AS (
      SELECT e.vec_id, CAST(t.i AS INTEGER) AS i,
             CAST(floor(CAST(e.embedding[CAST(t.i AS INTEGER)] AS DOUBLE)
                        * {float(GRAM_SCALE)} + 0.5) AS BIGINT) AS qx
      FROM embeddings e, range(1, 65) t(i))
    SELECT a.i AS i, b.i AS j,
           round(CAST(SUM(CAST(a.qx AS DECIMAL(38,0))
                          * CAST(b.qx AS DECIMAL(38,0))) AS DOUBLE)
                 / {float(GRAM_SCALE) ** 2}, 6) AS gram
    FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
    doc="Distributed Gram matrix (upper triangle, 1-based dims) of the "
    "quantized embedding column — the PCA/whitening input. mapInPandas "
    "emits one 2080-row int64 partial per Arrow batch (vectorized 64x64 "
    "matmul), then a DECIMAL(38,0) groupBy folds partials: the shuffle "
    "is O(#batches x d^2), independent of corpus row count.",
)
def gram_matrix_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    partials = emb.select("embedding").mapInPandas(
        _gram_partials, schema="i int, j int, part long"
    )
    return partials.groupBy("i", "j").agg(
        F.round(
            F.sum(F.col("part").cast("decimal(38,0)")).cast("double")
            / F.lit(float(GRAM_SCALE) ** 2),
            6,
        ).alias("gram")
    )


@register(
    "prefix_filter_jaccard_pairs",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle AS token FROM
        (SELECT doc_id, unnest({O.shingles("text", PF_N)}) AS shingle
         FROM documents)),
    nt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    ov AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS overlap
      FROM sh a JOIN sh b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, overlap,
           round(CAST(overlap AS DOUBLE) / (na.n + nb.n - overlap), 6)
             AS jacc
    FROM ov JOIN nt na ON na.doc_id = doc_a
            JOIN nt nb ON nb.doc_id = doc_b
    WHERE overlap * {PF_TD} >= {PF_TN} * (na.n + nb.n - overlap)
    """,
    doc="Exact Jaccard >= 0.5 document pairs over 5-word shingles via "
    "AllPairs prefix filtering: candidates share a shingle among each "
    "side's n - ceil(t*n) + 1 RAREST shingles (global (df, token) "
    "order). Safe because J >= t forces overlap >= ceil(t*n) on each "
    "side, and same-order prefixes of length n - ceil(t*n) + 1 must "
    "then intersect; the oracle joins on ANY shared shingle and agrees. "
    "At 100 TB the prefix index halves the inverted index and keeps "
    "df-hot shingles out of most prefixes — candidate generation stays "
    "near-linear instead of quadratic in hot-token document frequency.",
)
def prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(word_shingles("text", PF_N)).alias("token")
    ).distinct()
    nt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    dfc = sh.groupBy("token").agg(F.count("*").alias("dfc"))
    # per-doc rarity rank: window bounded by the doc's own shingle count
    rn_w = Window.partitionBy("doc_id").orderBy("dfc", "token")
    prefix_len = F.expr(f"n - ((n * {PF_TN} + {PF_TD} - 1) div {PF_TD}) + 1")
    pref = (
        sh.join(dfc, "token")
        .withColumn("rn", F.row_number().over(rn_w))
        .join(nt, "doc_id")
        .filter(F.col("rn") <= prefix_len)
        .select("doc_id", "token")
    )
    cand = (
        pref.select(F.col("doc_id").alias("doc_a"), "token")
        .join(pref.select(F.col("doc_id").alias("doc_b"), "token"), "token")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ov = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "token"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "token"),
            ["doc_b", "token"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("overlap"))
    )
    union_sz = F.col("na") + F.col("nb") - F.col("overlap")
    return (
        ov.join(
            nt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            nt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .filter(F.col("overlap") * PF_TD >= PF_TN * union_sz)
        .select(
            "doc_a",
            "doc_b",
            "overlap",
            F.round(F.col("overlap").cast("double") / union_sz, 6).alias(
                "jacc"
            ),
        )
    )


@register(
    "seasonal_anomalies_events",
    f"""
    WITH dh AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             (((CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01')
               + 4) % 7) AS dow,
             CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2, 3),
    slot AS (SELECT dow, hour, SUM(cnt) AS tot, COUNT(*) AS nd
             FROM dh GROUP BY 1, 2)
    SELECT dh.day, CAST(dh.dow AS INTEGER) AS dow, dh.hour, dh.cnt,
           CAST(slot.tot - dh.cnt AS BIGINT) AS rest_total,
           CAST(slot.nd - 1 AS INTEGER) AS n_other,
           round(CAST(dh.cnt * (slot.nd - 1) AS DOUBLE)
                 / nullif(slot.tot - dh.cnt, 0), 4) AS ratio
    FROM dh JOIN slot USING (dow, hour)
    WHERE slot.nd > 1
      AND dh.cnt * (slot.nd - 1) * 10
          >= {SEASONAL_THR_X10} * (slot.tot - dh.cnt)
    """,
    doc="Hour-of-week seasonal anomaly flags: day-hour counts vs the "
    "leave-one-out mean of the SAME (dow, hour) slot across other days, "
    "flagged at >= 1.5x via cross-multiplied integers (exact; no "
    "division in the predicate). One data-sized shuffle (the day-hour "
    "rollup); the slot re-aggregate is a window over <= #days/7 rows "
    "per (dow, hour) partition — bounded regardless of event volume.",
)
def seasonal_anomalies_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dh = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.pmod(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))) + 4,
            F.lit(7),
        )
        .cast("int")
        .alias("dow"),
        F.hour("ts").alias("hour"),
    ).agg(F.count("*").alias("cnt"))
    slot_w = Window.partitionBy("dow", "hour")
    slotted = dh.withColumn("tot", F.sum("cnt").over(slot_w)).withColumn(
        "nd", F.count(F.lit(1)).over(slot_w)
    )
    rest = F.col("tot") - F.col("cnt")
    n_other = F.col("nd") - 1
    return (
        slotted.filter(
            (F.col("nd") > 1)
            & (F.col("cnt") * n_other * 10 >= SEASONAL_THR_X10 * rest)
        )
        .select(
            "day",
            "dow",
            "hour",
            "cnt",
            rest.alias("rest_total"),
            n_other.cast("int").alias("n_other"),
            F.round(
                (F.col("cnt") * n_other).cast("double")
                / F.nullif(rest, F.lit(0)),
                4,
            ).alias("ratio"),
        )
    )
