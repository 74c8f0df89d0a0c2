"""Registry entries: reshaping + sampling surface.

  * ``unpivot_order_measures`` — wide→long melt (`DataFrame.unpivot`),
    the inverse of ``pivot_user_events``.
  * ``grouping_sets_lineitem`` — explicit GROUPING SETS with
    ``grouping_id`` disambiguating the NULL-as-total rows from genuine
    NULL keys (cube/rollup queries cover the derived forms).
  * ``sample_documents_stratified`` — seeded per-stratum Bernoulli
    sampling (``sampleBy``). Sampling is a first-class training-data op
    (corpus downsampling/reweighting); RNG streams are engine-specific
    so there is no SQL oracle — the driver records rows-only and
    tests/test_reshape.py pins determinism-under-seed and per-stratum
    rate bounds instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register


@register(
    "unpivot_order_measures",
    """
    SELECT o_orderkey, measure, round(CAST(value AS DOUBLE), 4) AS value
    FROM (UNPIVOT (SELECT o_orderkey,
                          o_totalprice,
                          CAST(year(o_orderdate) AS DOUBLE) AS order_year
                   FROM orders)
          ON o_totalprice, order_year INTO NAME measure VALUE value)
    """,
    doc="Wide→long melt (DataFrame.unpivot — the inverse of "
    "pivot_user_events): each order row becomes one row per measure. "
    "Pure narrow transformation, no shuffle.",
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").cast("double").alias("order_year"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["o_totalprice", "order_year"],
        variableColumnName="measure",
        valueColumnName="value",
    ).select("o_orderkey", "measure", F.round("value", 4).alias("value"))


@register(
    "grouping_sets_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="Explicit GROUPING SETS (detail, per-flag, grand total) with "
    "grouping_id so total rows are distinguishable from NULL keys — "
    "computed in ONE shuffle via Expand, not three scans.",
)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n")
    )


STRATA_FRACS = {"short": 0.5, "long": 0.1}


def _stratified_sample(spark: SparkSession, sf_dir: str, seed: int = 42) -> DataFrame:
    """The raw seeded sampleBy output (internal; RNG membership is
    engine-specific so it cannot be the registered driver-facing shape)."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "stratum", F.when(F.col("n_chars") < 200, "short").otherwise("long")
    )
    return d.stat.sampleBy("stratum", fractions=STRATA_FRACS, seed=seed).select(
        "doc_id", "stratum"
    )


@register(
    "sample_documents_stratified",
    """
    SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS rate_ok, TRUE AS deterministic_ok
    FROM (SELECT CASE WHEN n_chars < 200 THEN 'short' ELSE 'long' END AS stratum
          FROM documents)
    GROUP BY stratum
    """,
    doc="Seeded stratified Bernoulli sample (sampleBy source): 50% of "
    "short docs, 10% of long docs — corpus downsampling/reweighting as "
    "a training-data op. RNG membership is engine-specific, so the "
    "registered output is the per-stratum BOUNDS VERDICT the driver can "
    "hash (VERDICT r04 #3): observed rate within 5 sigma of the target "
    "fraction, and the same seed reproduces the identical member set. "
    "A biased or non-reproducible sampler flips a boolean; raw "
    "membership stays pinned in tests/test_reshape.py.",
)
def sample_documents_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").withColumn(
        "stratum", F.when(F.col("n_chars") < 200, "short").otherwise("long")
    )
    totals = d.groupBy("stratum").agg(F.count("*").alias("n_total"))
    s1 = _stratified_sample(spark, sf_dir)
    s2 = _stratified_sample(spark, sf_dir).withColumnRenamed("doc_id", "doc_id2")
    n1 = s1.groupBy("stratum").agg(F.count("*").alias("n_s1"))
    n2 = s2.groupBy("stratum").agg(F.count("*").alias("n_s2"))
    both = (
        s1.join(s2, (s1.doc_id == s2.doc_id2), "inner")
        .groupBy(s1.stratum)
        .agg(F.count("*").alias("n_both"))
    )
    fracs = spark.createDataFrame(
        [(k, float(v)) for k, v in STRATA_FRACS.items()], ["stratum", "frac"]
    )
    j = (
        totals.join(n1, "stratum", "left")
        .join(n2, "stratum", "left")
        .join(both, "stratum", "left")
        .join(F.broadcast(fracs), "stratum")
        .na.fill(0, ["n_s1", "n_s2", "n_both"])
    )
    # 5-sigma binomial bound on the observed rate, plus 5/n slack so tiny
    # strata (local sf0.001) can never flake the verdict
    bound = (
        F.lit(5.0)
        * F.sqrt(F.col("frac") * (1.0 - F.col("frac")) / F.col("n_total"))
        + F.lit(5.0) / F.col("n_total")
    )
    return j.select(
        "stratum",
        F.col("n_total").cast("bigint").alias("n_total"),
        (
            F.abs(F.col("n_s1") / F.col("n_total") - F.col("frac")) <= bound
        ).alias("rate_ok"),
        (
            (F.col("n_s1") == F.col("n_s2")) & (F.col("n_both") == F.col("n_s1"))
        ).alias("deterministic_ok"),
    )


@register(
    "explode_outer_customer_orders",
    """
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey < 300
    """,
    doc="Generator with OUTER semantics: collect each customer's order "
    "ids, then explode_outer — customers with no orders survive as a "
    "NULL row (plain explode silently drops them, the classic lateral-"
    "view data-loss bug). Oracle is the equivalent left join.",
)
def explode_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    o = _t(spark, sf_dir, "orders")
    grouped = o.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list("o_orderkey")).alias("ids")
    )
    return (
        c.join(grouped, c.c_custkey == grouped.o_custkey, "left")
        .select("c_custkey", F.explode_outer("ids").alias("o_orderkey"))
    )


@register(
    "pivot_multi_agg_events",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS click_n,
           round(CAST(SUM(CASE WHEN event_type = 'click'
                     THEN CAST(round(value * 1000000) AS BIGINT)
                     ELSE 0 END)
                 AS DOUBLE) / 1000000.0, 4) AS click_total,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS purchase_n,
           round(CAST(SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(round(value * 1000000) AS BIGINT)
                     ELSE 0 END)
                 AS DOUBLE) / 1000000.0, 4) AS purchase_total
    FROM events GROUP BY user_id
    """,
    doc="Pivot with MULTIPLE aggregates per pivoted value (count + exact "
    "sum per event type): Spark's pivot(...).agg(a, b) emits "
    "<value>_<alias> columns; the oracle is the equivalent conditional "
    "aggregation. Single shuffle, map-side partials.",
)
def pivot_multi_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v6 = F.round(F.col("value") * 1_000_000).cast("long")
    out = (
        ev.select("user_id", "event_type", v6.alias("v6"))
        .groupBy("user_id")
        .pivot("event_type", ["click", "purchase"])
        .agg(
            F.count(F.lit(1)).alias("n"),  # star is rejected inside pivot agg
            F.round(
                F.sum(F.col("v6").cast("decimal(38,0)")).cast("double")
                / 1_000_000.0,
                4,
            ).alias("total"),
        )
    )
    return out.select(
        # coalesce like the sibling pivot_user_events: a user with zero
        # rows of a pivoted type gets NULL from pivot, while the oracle's
        # SUM(CASE ... ELSE 0) gives 0/0.0 (the ELSE 0 on the totals is
        # deliberate, added in lockstep — latent only while every fixture
        # user has both types; review r03)
        "user_id",
        F.coalesce(F.col("click_n").cast("bigint"), F.lit(0)).alias("click_n"),
        F.coalesce("click_total", F.lit(0.0)).alias("click_total"),
        F.coalesce(F.col("purchase_n").cast("bigint"), F.lit(0)).alias("purchase_n"),
        F.coalesce("purchase_total", F.lit(0.0)).alias("purchase_total"),
    )


@register(
    "variant_props_events",
    """
    SELECT event_type,
           CAST(props->>'$.k' AS INTEGER) // 10 AS k_decade,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    doc="Semi-structured VARIANT path (Spark 4): props parsed once to a "
    "VARIANT column (no schema declared up front, unlike from_json in "
    "json_props_stats), fields extracted lazily with variant_get — the "
    "open-schema ingestion pattern for evolving event payloads.",
)
def variant_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    var = F.parse_json("props")
    k = F.expr("variant_get(v, '$.k', 'int')")
    return (
        ev.select("event_type", var.alias("v"))
        .select("event_type", k.alias("k"))
        .groupBy("event_type", F.expr("k div 10").alias("k_decade"))
        .agg(F.count("*").alias("n"))
    )
