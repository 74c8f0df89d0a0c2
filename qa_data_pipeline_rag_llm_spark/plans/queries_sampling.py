"""Registry entries: deterministic sampling, dataset splits, percentile
bands, and snapshot merge — the corpus-management layer of a training-data
pipeline.

The reference has no sampling, no splits, no percentile logic, and its only
"merge" is an append-style union (SURVEY.md U1). These ops are the standard
curation moves around it: carve reproducible subsets, assign train/val/test,
trim length outliers, and apply latest-wins snapshot upserts.

Determinism strategy: RNG-based sampling can never cross-check against
another engine (each engine owns its streams — see sample_documents_
stratified), so all sampling here is HASH-based: md5 of the key produces
identical hex in Spark and DuckDB, and bucket arithmetic on that hex is
plain integer math. Hash sampling is also the 100 TB-correct answer —
stateless, shuffle-free, stable under repartitioning and retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register

# md5-hex first byte → 0..255 bucket; identical in both engines.
_SPARK_BUCKET = "CAST(conv(substr(md5(CAST({key} AS STRING)), 1, 2), 16, 10) AS INT)"
_DUCK_BUCKET = "CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 2)) AS INTEGER)"


@register(
    "hash_sample_documents",
    f"""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE {_DUCK_BUCKET.format(key="doc_id")} < 32
    """,
    doc="Deterministic ~12.5% corpus sample by md5 bucket of the key: "
    "reproducible across engines, retries, and repartitioning — unlike "
    "seeded RNG sampling, whose streams are engine- and split-layout-"
    "specific. Pure scan-side predicate, no shuffle.",
)
def hash_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_BUCKET.format(key="doc_id"))
    return d.filter(bucket < 32).select("doc_id", "source", "n_chars")


@register(
    "split_assign_documents",
    f"""
    WITH b AS (SELECT doc_id, source,
                      {_DUCK_BUCKET.format(key="doc_id")} AS bucket
               FROM documents)
    SELECT source, split, COUNT(*) AS n, min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM (SELECT doc_id, source,
                 CASE WHEN bucket < 204 THEN 'train'
                      WHEN bucket < 230 THEN 'val'
                      ELSE 'test' END AS split
          FROM b)
    GROUP BY source, split
    """,
    doc="Deterministic train/val/test assignment (~80/10/10) by hashed key "
    "bucket, summarized per source: the split a doc lands in is a pure "
    "function of its id — stable as the corpus grows, no shuffled RNG "
    "state, auditable by re-hashing.",
)
def split_assign_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_BUCKET.format(key="doc_id"))
    split = (
        F.when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
    )
    return (
        d.select("doc_id", "source", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@register(
    "weighted_sample_by_source",
    f"""
    WITH w AS (
      SELECT source, CASE WHEN CAST(substr(source, 4) AS INTEGER) % 3 = 0
                          THEN 192 ELSE 64 END AS keep_of_256
      FROM (SELECT DISTINCT source FROM documents)
    )
    SELECT d.source, w.keep_of_256, COUNT(*) AS n_kept
    FROM documents d JOIN w ON d.source = w.source
    WHERE {_DUCK_BUCKET.format(key="doc_id")} < w.keep_of_256
    GROUP BY d.source, w.keep_of_256
    """,
    doc="Per-source weighted corpus mixing: each source gets its own "
    "hash-bucket keep rate (75% for every third source id, 25% "
    "otherwise — standing in for quality-tiered mixing weights). The "
    "weight table is derived and broadcast; membership stays a pure "
    "function of (doc_id, source weight) — re-mixable without RNG state, "
    "which is how upweighting/downweighting sources stays reproducible "
    "across pipeline reruns at 100 TB.",
)
def weighted_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    weights = (
        d.select("source")
        .distinct()
        .withColumn(
            "keep_of_256",
            F.when(
                # substring-to-end (no length arg), mirroring the oracle's
                # substr(source, 4) — a length cap would silently diverge
                # on long source ids (ADVICE r01)
                F.expr("substring(source, 4)").cast("int") % 3 == 0, 192
            ).otherwise(64),
        )
    )
    bucket = F.expr(_SPARK_BUCKET.format(key="doc_id"))
    return (
        d.join(F.broadcast(weights), "source")
        .filter(bucket < F.col("keep_of_256"))
        .groupBy("source", "keep_of_256")
        .agg(F.count("*").alias("n_kept"))
    )


@register(
    "length_band_documents",
    """
    WITH cuts AS (
      SELECT quantile_cont(n_chars, 0.05) AS lo,
             quantile_cont(n_chars, 0.95) AS hi
      FROM documents)
    SELECT doc_id, n_chars
    FROM documents, cuts
    WHERE n_chars >= lo AND n_chars <= hi
    """,
    doc="Length-percentile band filter (keep p05–p95 by n_chars): the "
    "standard outlier trim before LLM training. The two cut points are a "
    "scalar aggregate broadcast back over the scan — one pass for cuts, "
    "one for the filter; linear-interpolated percentile matches DuckDB's "
    "quantile_cont bit-for-bit on integer inputs.",
)
def length_band_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    cuts = d.agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    return (
        d.join(F.broadcast(cuts))
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .select("doc_id", "n_chars")
    )


@register(
    "percentiles_value_events",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` ≡ "
    "DuckDB quantile_cont, both linear interpolation). Exact percentile "
    "holds each group's values — correct at dimension-table scale; the "
    "100 TB fact-table path is approx_percentile (KLL-style sketch, "
    "mergeable map-side), exercised in sketch_stats_events.",
)
def percentiles_value_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@register(
    "snapshot_merge_orders",
    """
    WITH delta AS (
      SELECT o_orderkey, o_custkey, 'P' AS o_orderstatus,
             o_totalprice + 1000.0 AS o_totalprice, 2 AS version
      FROM orders WHERE o_orderkey % 10 = 0
    ), unioned AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 1 AS version
      FROM orders
      UNION ALL SELECT * FROM delta
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, version FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                   ORDER BY version DESC) AS rn
      FROM unioned) WHERE rn = 1
    """,
    doc="Latest-wins snapshot upsert (MERGE/SCD-1 semantics) without a "
    "table format: union base + delta tagged with versions, keep the "
    "newest row per key via one windowed rank — a single shuffle on the "
    "merge key. The delta here is derived (10% of orders repriced) so the "
    "op is self-contained and oracle-checkable; on a lakehouse the same "
    "plan backs MERGE INTO.",
)
def snapshot_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit(1).alias("version"),
    )
    delta = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("P").alias("o_orderstatus"),
            # exact double add — a derived reprice like round(x*1.1, 2)
            # diverges between engines by one ulp on half-way cases
            (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
            F.lit(2).alias("version"),
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    return (
        base.unionByName(delta)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


QUOTA_PER_SOURCE = 15


@register(
    "quota_sample_documents",
    f"""
    SELECT source, doc_id, CAST(smp_rank AS INTEGER) AS smp_rank FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS smp_rank
      FROM documents)
    WHERE smp_rank <= {QUOTA_PER_SOURCE}
    """,
    doc="EXACT-quota stratified sample: precisely N docs per source, "
    "chosen by md5-hash order (uniform, reproducible, engine-"
    "independent — the deterministic twin of sample_documents_"
    "stratified's RNG sampleBy, which can only promise expected "
    "fractions). One window shuffle on the stratum key; the hash order "
    "makes the pick unbiased without any RNG state.",
)
def quota_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select(
            "source",
            "doc_id",
            F.row_number().over(w).cast("int").alias("smp_rank"),
        )
        .filter(F.col("smp_rank") <= QUOTA_PER_SOURCE)
    )


@register(
    "survivorship_documents",
    """
    SELECT md5(trim(lower(regexp_replace(text,
                                         '[\\W_]+', ' ', 'g')))) AS fingerprint,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(doc_id) AS survivor_doc_id,
           MAX(n_chars) AS best_n_chars,
           MIN(source) AS first_source
    FROM documents
    GROUP BY 1
    """,
    doc="MDM-style survivorship merge: exact-duplicate groups (normalized-"
    "text fingerprint) collapse to ONE golden record whose fields are "
    "picked field-wise across members — stable min id, the longest "
    "length, the first source. The step after dedup detection that "
    "actually emits the merged corpus row. One map-side-combinable "
    "aggregate on the content hash (uniform key, skew-safe).",
)
def survivorship_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.groupBy(fingerprint("text").alias("fingerprint")).agg(
        F.count("*").alias("n_members"),
        F.min("doc_id").alias("survivor_doc_id"),
        F.max("n_chars").alias("best_n_chars"),
        F.min("source").alias("first_source"),
    )


@register(
    "cdc_apply_orders",
    """
    WITH changes AS (
      SELECT o_orderkey, o_totalprice, 'D' AS op FROM orders
      WHERE o_orderkey % 11 = 0
      UNION ALL
      SELECT o_orderkey, o_totalprice + 100.0, 'U' FROM orders
      WHERE o_orderkey % 11 != 0 AND o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 1000000000, o_totalprice, 'I' FROM orders
      WHERE o_orderkey % 5 = 0),
    unioned AS (
      SELECT o_orderkey, o_totalprice, 'base' AS op, 0 AS seq FROM orders
      UNION ALL
      SELECT o_orderkey, o_totalprice, op, 1 AS seq FROM changes),
    latest AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                     ORDER BY seq DESC, op) AS rn
        FROM unioned) WHERE rn = 1)
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           op AS last_op
    FROM latest WHERE op != 'D'
    """,
    doc="CDC APPLY (the lakehouse MERGE pattern beyond snapshot_merge's "
    "upserts): a change batch carrying inserts, updates, AND deletes "
    "lands on the base snapshot — latest-wins per key via one window "
    "over the union, deletes drop out at the end. The synthesized "
    "change feed derives deterministically from orders so both engines "
    "replay it; one shuffle on the merge key.",
)
def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    deletes = o.filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey", "o_totalprice", F.lit("D").alias("op")
    )
    updates = o.filter(
        (F.col("o_orderkey") % 11 != 0) & (F.col("o_orderkey") % 7 == 0)
    ).select(
        "o_orderkey",
        (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
        F.lit("U").alias("op"),
    )
    inserts = o.filter(F.col("o_orderkey") % 5 == 0).select(
        (F.col("o_orderkey") + 1_000_000_000).alias("o_orderkey"),
        "o_totalprice",
        F.lit("I").alias("op"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    unioned = o.select(
        "o_orderkey", "o_totalprice", F.lit("base").alias("op"), F.lit(0).alias("seq")
    ).unionByName(changes.withColumn("seq", F.lit(1)))
    # op tie-break: at huge SFs a synthetic insert key (base + 1e9) can
    # collide with a real orderkey whose D/U change shares seq=1 — the op
    # order keeps the winner deterministic and cross-engine identical
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("seq"), "op")
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("op").alias("last_op"),
        )
    )
