"""Registry entries: snapshot diffing (CDC), corpus-overlap matrices, and
co-occurrence mining.

The change-classification twin of the latest-wins merge
(queries_sampling.snapshot_merge_orders): a pipeline that upserts also
needs to REPORT what changed. The overlap matrix and co-purchase pairs
are the discovery side of curation — which sources duplicate each other,
which items travel together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register


@register(
    "snapshot_diff_orders",
    """
    WITH base AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 != 0
    ), next AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 != 1
    )
    SELECT change, COUNT(*) AS n FROM (
      SELECT CASE WHEN b.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN b.o_totalprice <> n.o_totalprice THEN 'changed'
                  ELSE 'unchanged' END AS change
      FROM base b FULL OUTER JOIN next n ON n.o_orderkey = b.o_orderkey)
    GROUP BY change
    """,
    doc="CDC-style snapshot diff: full outer join of two derived table "
    "versions, each row classified added/removed/changed/unchanged — the "
    "reporting twin of the latest-wins merge. One shuffle on the key; "
    "the derived versions keep the op self-contained and oracle-exact "
    "(value drift uses plain addition, not float multiplication).",
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    nxt = o.filter(F.col("o_orderkey") % 7 != 1).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1000.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    b, n = base.alias("b"), nxt.alias("n")
    change = (
        F.when(F.col("b.o_orderkey").isNull(), "added")
        .when(F.col("n.o_orderkey").isNull(), "removed")
        .when(F.col("b.o_totalprice") != F.col("n.o_totalprice"), "changed")
        .otherwise("unchanged")
    )
    return (
        b.join(n, F.col("n.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
        .select(change.alias("change"))
        .groupBy("change")
        .agg(F.count("*").alias("n"))
    )


@register(
    "source_vocab_overlap",
    """
    WITH vocab AS (
      SELECT DISTINCT source, w FROM (
        SELECT source, unnest(string_split(coalesce(text, ''), ' ')) AS w
        FROM documents)
      WHERE w <> ''
    ), sizes AS (
      SELECT source, COUNT(*) AS nv FROM vocab GROUP BY source
    ), inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT src_a, src_b, n_common,
           round(CAST(n_common AS DOUBLE)
                 / (sa.nv + sb.nv - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    """,
    doc="Pairwise vocabulary-overlap (Jaccard) matrix between corpus "
    "sources — the diversity audit that flags near-identical sources "
    "before mixing weights are chosen. Token sets deduped per source "
    "first, so the self-join is vocabulary-sized, not token-stream-"
    "sized; Jaccard from exact set counts.",
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    vocab = (
        d.select(
            "source",
            F.explode(
                F.split(F.coalesce(F.col("text"), F.lit("")), " ")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count("*").alias("nv"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("nv").alias("nv_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("nv").alias("nv_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("nv_a") + F.col("nv_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "length_drift_sources",
    """
    WITH tagged AS (
      SELECT n_chars,
             SUM(CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
                      THEN 1 ELSE 0 END) AS a_n,
             SUM(CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
                      THEN 0 ELSE 1 END) AS b_n
      FROM documents GROUP BY n_chars
    ), tot AS (
      SELECT CAST(SUM(a_n) AS DOUBLE) AS na, CAST(SUM(b_n) AS DOUBLE) AS nb
      FROM tagged
    ), cdf AS (
      SELECT n_chars,
             SUM(a_n) OVER (ORDER BY n_chars) AS ca,
             SUM(b_n) OVER (ORDER BY n_chars) AS cb
      FROM tagged)
    SELECT n_chars AS at_value,
           round(abs(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb), 6)
             AS ks_gap
    FROM cdf CROSS JOIN tot
    ORDER BY ks_gap DESC, at_value
    LIMIT 1
    """,
    doc="Distribution-drift detection (Kolmogorov–Smirnov statistic) "
    "between even- and odd-numbered sources' document lengths: grouped "
    "counts per distinct value, one cumulative window, max CDF gap — "
    "how a pipeline catches a source whose length profile shifted "
    "between crawls. CDFs are exact integer ratios; the windowed cumsum "
    "runs over distinct values, not rows.",
)
def length_drift_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    # substring-to-end mirrors the oracle's substr(source, 4) (ADVICE r01)
    is_a = F.expr("substring(source, 4)").cast("int") % 2 == 0
    tagged = d.groupBy("n_chars").agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("a_n"),
        F.sum(F.when(is_a, 0).otherwise(1)).alias("b_n"),
    )
    tot = tagged.agg(
        F.sum("a_n").cast("double").alias("na"),
        F.sum("b_n").cast("double").alias("nb"),
    )
    w = Window.orderBy("n_chars")
    cdf = tagged.select(
        "n_chars",
        F.sum("a_n").over(w).alias("ca"),
        F.sum("b_n").over(w).alias("cb"),
    )
    # ANSI-safe: a hash split can leave one side empty on a tiny corpus —
    # na/nb = 0 must yield the oracle's NULL, not a Spark exception
    gap = F.round(
        F.abs(
            F.col("ca").cast("double")
            / F.when(F.col("na") != 0, F.col("na"))
            - F.col("cb").cast("double")
            / F.when(F.col("nb") != 0, F.col("nb"))
        ),
        6,
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .select(F.col("n_chars").alias("at_value"), gap.alias("ks_gap"))
        .orderBy(F.desc("ks_gap"), "at_value")
        .limit(1)
    )


@register(
    "copurchase_part_pairs",
    """
    SELECT p_a, p_b, n FROM (
      SELECT a.l_partkey AS p_a, b.l_partkey AS p_b, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC,
                                a.l_partkey, b.l_partkey) AS rnk
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey)
    WHERE rnk <= 20
    """,
    doc="Market-basket mining: top-20 part pairs co-occurring in the same "
    "order. The self-join is keyed on l_orderkey, so pair blow-up is "
    "bounded by lines-per-order squared (~7² here), never corpus-wide; "
    "deterministic rank tie-break on the pair ids.",
)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p_a"), F.col("b.l_partkey").alias("p_b")
        )
        .agg(F.count("*").alias("n"))
    )
    # top-20 via orderBy+limit → TakeOrderedAndProject; the pair-counts
    # frame grows with the data, so no rank window may scan it
    # (VERDICT r02 #1 bug class)
    return (
        pairs.orderBy(F.col("n").desc(), "p_a", "p_b")
        .limit(20)
        .select("p_a", "p_b", "n")
    )


@register(
    "cross_source_leakage",
    None,  # injected below: composes the verified near-dup pair oracle
    doc="Cross-SOURCE near-duplicate leakage: verified MinHash pairs "
    "whose two docs come from different sources, aggregated to a "
    "source-pair contamination matrix (canonical source order). The "
    "measure that catches one provider reselling another's corpus — "
    "or eval data leaking into training sources. Reuses the banded, "
    "Jaccard-verified pair stream; the per-pair source lookup joins "
    "the tiny pair set back to documents.",
)
def cross_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY

    pairs = REGISTRY["minhash_near_dups"].spark(spark, sf_dir)
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    labeled = (
        pairs.join(
            d.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")
            ),
            "doc_a",
        )
        .join(
            d.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")
            ),
            "doc_b",
        )
        .filter(F.col("src_a") != F.col("src_b"))
    )
    lo = F.least("src_a", "src_b")
    hi = F.greatest("src_a", "src_b")
    return labeled.select(
        lo.alias("source_x"), hi.alias("source_y"), "jaccard"
    ).groupBy("source_x", "source_y").agg(
        F.count("*").alias("n_pairs"),
        # order-independent exact mean: 6-dp-scaled longs sum in DECIMAL
        F.round(
            F.sum(
                F.round(F.col("jaccard") * 1000000)
                .cast("long")
                .cast("decimal(38,0)")
            ).cast("double")
            / 1000000.0
            / F.count("*"),
            6,
        ).alias("avg_jaccard"),
        F.max("jaccard").alias("max_jaccard"),
    )


from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY as _R  # noqa: E402

_R["cross_source_leakage"].oracle = f"""
    WITH pairs AS ({_R["minhash_near_dups"].oracle}),
    labeled AS (
      SELECT least(da.source, db.source) AS source_x,
             greatest(da.source, db.source) AS source_y,
             p.jaccard
      FROM pairs p
      JOIN documents da ON p.doc_a = da.doc_id
      JOIN documents db ON p.doc_b = db.doc_id
      WHERE da.source != db.source)
    SELECT source_x, source_y,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(round(jaccard * 1000000) AS DECIMAL(38,0)))
                      AS DOUBLE) / 1000000.0 / COUNT(*), 6) AS avg_jaccard,
           MAX(jaccard) AS max_jaccard
    FROM labeled GROUP BY source_x, source_y
"""


@register(
    "split_leakage_audit_documents",
    None,  # injected below: composes the verified near-dup pair oracle
    doc="Train/val/test near-duplicate LEAKAGE audit: verified MinHash "
    "pairs labeled with each doc's deterministic hash-bucket split "
    "(the split_assign_documents rule), aggregated per canonical split "
    "pair with an is_leak flag on cross-split rows. This is the "
    "dedup x split interaction every training pipeline must gate on — "
    "a near-dup of a held-out doc inside train silently inflates "
    "eval; same-split rows stay as the base rate. Reuses the banded "
    "Jaccard-verified pair stream (never all-pairs); the split label "
    "is a pure projection of doc_id, so labeling adds two key-only "
    "joins of the tiny pair set back to documents.",
)
def split_leakage_audit_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
    from qa_data_pipeline_rag_llm_spark.plans.queries_sampling import (
        _SPARK_BUCKET,
    )

    pairs = REGISTRY["minhash_near_dups"].spark(spark, sf_dir)
    bucket = F.expr(_SPARK_BUCKET.format(key="doc_id"))
    split = (
        F.when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
    )
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", split.alias("split")
    )
    labeled = pairs.join(
        d.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sp_a")),
        "doc_a",
    ).join(
        d.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sp_b")),
        "doc_b",
    )
    lo, hi = F.least("sp_a", "sp_b"), F.greatest("sp_a", "sp_b")
    return (
        labeled.select(lo.alias("split_x"), hi.alias("split_y"), "jaccard")
        .groupBy("split_x", "split_y")
        .agg(
            F.count("*").alias("n_pairs"),
            # order-independent exact mean (the cross_source_leakage scheme)
            F.round(
                F.sum(
                    F.round(F.col("jaccard") * 1000000)
                    .cast("long")
                    .cast("decimal(38,0)")
                ).cast("double")
                / 1000000.0
                / F.count("*"),
                6,
            ).alias("avg_jaccard"),
            F.max("jaccard").alias("max_jaccard"),
        )
        .withColumn("is_leak", F.col("split_x") != F.col("split_y"))
    )


from qa_data_pipeline_rag_llm_spark.plans.queries_sampling import (  # noqa: E402
    _DUCK_BUCKET as _DB,
)

_R["split_leakage_audit_documents"].oracle = f"""
    WITH pairs AS ({_R["minhash_near_dups"].oracle}),
    lab AS (SELECT doc_id,
                   CASE WHEN {_DB.format(key="doc_id")} < 204 THEN 'train'
                        WHEN {_DB.format(key="doc_id")} < 230 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents),
    labeled AS (
      SELECT least(la.split, lb.split) AS split_x,
             greatest(la.split, lb.split) AS split_y,
             p.jaccard
      FROM pairs p
      JOIN lab la ON p.doc_a = la.doc_id
      JOIN lab lb ON p.doc_b = lb.doc_id)
    SELECT split_x, split_y,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(round(jaccard * 1000000) AS DECIMAL(38,0)))
                      AS DOUBLE) / 1000000.0 / COUNT(*), 6) AS avg_jaccard,
           MAX(jaccard) AS max_jaccard,
           (split_x <> split_y) AS is_leak
    FROM labeled GROUP BY split_x, split_y
"""


@register(
    "leakage_quarantine_documents",
    None,  # injected below: composes the verified near-dup pair oracle
    doc="The REPAIR step after split_leakage_audit_documents: every TRAIN "
    "doc that is a verified MinHash near-dup of a VAL or TEST doc is "
    "quarantined (removed from train), so no held-out document has a "
    "near-copy inside the training split. Output: per-source train "
    "counts before/after and the quarantine rate — the decontamination "
    "summary a data-release report prints. Same banded pair stream as "
    "the audit (never all-pairs); the quarantine set is a semi-join of "
    "train docs against the cross-split pair frame.",
)
def leakage_quarantine_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
    from qa_data_pipeline_rag_llm_spark.plans.queries_sampling import (
        _SPARK_BUCKET,
    )

    pairs = REGISTRY["minhash_near_dups"].spark(spark, sf_dir)
    bucket = F.expr(_SPARK_BUCKET.format(key="doc_id"))
    split = (
        F.when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
    )
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", split.alias("split")
    )
    labeled = pairs.join(
        d.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sp_a")),
        "doc_a",
    ).join(
        d.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sp_b")),
        "doc_b",
    )
    # train-side doc of every cross-split near-dup pair, either direction
    tainted = (
        labeled.filter(
            (F.col("sp_a") == "train") & (F.col("sp_b") != "train")
        )
        .select(F.col("doc_a").alias("doc_id"))
        .unionByName(
            labeled.filter(
                (F.col("sp_b") == "train") & (F.col("sp_a") != "train")
            ).select(F.col("doc_b").alias("doc_id"))
        )
        .distinct()
    )
    train = d.filter(F.col("split") == "train")
    quarantined = train.join(tainted, "doc_id", "left_semi")
    n_train = train.groupBy("source").agg(F.count("*").alias("n_train"))
    n_q = quarantined.groupBy("source").agg(F.count("*").alias("n_quarantined"))
    return (
        n_train.join(n_q, "source", "left_outer")
        .select(
            "source",
            "n_train",
            F.coalesce("n_quarantined", F.lit(0)).alias("n_quarantined"),
            (F.col("n_train") - F.coalesce("n_quarantined", F.lit(0))).alias(
                "n_train_clean"
            ),
            F.round(
                F.coalesce("n_quarantined", F.lit(0))
                / F.col("n_train").cast("double"),
                6,
            ).alias("quarantine_rate"),
        )
    )


_R["leakage_quarantine_documents"].oracle = f"""
    WITH pairs AS ({_R["minhash_near_dups"].oracle}),
    lab AS (SELECT doc_id, source,
                   CASE WHEN {_DB.format(key="doc_id")} < 204 THEN 'train'
                        WHEN {_DB.format(key="doc_id")} < 230 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents),
    labeled AS (
      SELECT p.doc_a, p.doc_b, la.split AS sp_a, lb.split AS sp_b
      FROM pairs p
      JOIN lab la ON p.doc_a = la.doc_id
      JOIN lab lb ON p.doc_b = lb.doc_id),
    tainted AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM labeled
        WHERE sp_a = 'train' AND sp_b != 'train'
        UNION ALL
        SELECT doc_b AS doc_id FROM labeled
        WHERE sp_b = 'train' AND sp_a != 'train')),
    train AS (SELECT doc_id, source FROM lab WHERE split = 'train'),
    q AS (SELECT t.source, COUNT(*) AS n_quarantined
          FROM train t JOIN tainted x ON t.doc_id = x.doc_id
          GROUP BY t.source),
    nt AS (SELECT source, COUNT(*) AS n_train FROM train GROUP BY source)
    SELECT nt.source,
           CAST(nt.n_train AS BIGINT) AS n_train,
           CAST(COALESCE(q.n_quarantined, 0) AS BIGINT) AS n_quarantined,
           CAST(nt.n_train - COALESCE(q.n_quarantined, 0) AS BIGINT)
             AS n_train_clean,
           round(COALESCE(q.n_quarantined, 0)
                 / CAST(nt.n_train AS DOUBLE), 6) AS quarantine_rate
    FROM nt LEFT JOIN q ON nt.source = q.source
"""
