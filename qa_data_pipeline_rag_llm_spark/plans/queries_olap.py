"""Registry entries: wider OLAP/relational surface (SURVEY.md §7 stage 2).

None of these shapes exist in the reference (single join + one window is
its whole relational repertoire — §2.4-2.6); they complete the generic
query capability the north star demands, each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.text import html_strip, strip_id_prefix
from qa_data_pipeline_rag_llm_spark.operators.ranking import top_k_per_group
from qa_data_pipeline_rag_llm_spark.plans.queries import SCALE, _t, o_sl, register


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS as a conditioned left-semi join.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
            "semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@register(
    "cheapest_supplier_per_part",
    """
    SELECT l_partkey, l_suppkey, l_extendedprice FROM (
      SELECT l_partkey, l_suppkey, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY l_extendedprice, l_suppkey, l_orderkey,
                                         l_linenumber) AS rn
      FROM lineitem) WHERE rn = 1
    """,
    doc="TPC-H Q2 shape (no partsupp table in testdata): min-cost supplier "
    "per part via one windowed rank — no self-join re-scan.",
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return top_k_per_group(
        li.select(
            "l_partkey", "l_suppkey", "l_extendedprice", "l_orderkey", "l_linenumber"
        ),
        group_by=["l_partkey"],
        order_by=[
            F.col("l_extendedprice"),
            F.col("l_suppkey"),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        ],
        k=1,
    ).select("l_partkey", "l_suppkey", "l_extendedprice")


@register(
    "string_funcs_documents",
    """
    SELECT doc_id,
           regexp_replace('t3_' || CAST(doc_id AS VARCHAR), '^t3_', '') AS stripped_id,
           replace(replace(replace(replace(replace(replace(
             regexp_replace('<p>' || substr(text, 1, 30) || '</p> &amp; more', '<[^>]+>', '', 'g'),
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS cleaned,
           'Title : ' || upper(lang) || chr(10) || 'Body : ' || trim(substr(text, 1, 20)) AS templated
    FROM documents
    """,
    doc="F1/F2/F3: HTML strip + entity unescape (SQL path of the "
    "reference's only UDF — STACK-Nettoyage-Posts.py:77-87), id prefix "
    "strip (REDDIT-Ingestion.py:76), prompt template concat "
    "(PLATFORM-contextual-Chunking.py:58-65).",
)
def string_funcs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    fake_html = F.concat(
        F.lit("<p>"), F.substring("text", 1, 30), F.lit("</p> &amp; more")
    )
    return d.select(
        "doc_id",
        strip_id_prefix(F.concat(F.lit("t3_"), F.col("doc_id").cast("string"))).alias(
            "stripped_id"
        ),
        html_strip(fake_html).alias("cleaned"),
        F.concat(
            F.lit("Title : "),
            F.upper("lang"),
            F.lit("\n"),
            F.lit("Body : "),
            F.trim(F.substring("text", 1, 20)),
        ).alias("templated"),
    )


@register(
    "cube_events",
    """
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(user_id % 10 AS VARCHAR), 'ALL') AS user_bucket,
           COUNT(*) AS n
    FROM events GROUP BY CUBE (event_type, user_id % 10)
    """,
    doc="CUBE grouping sets (generic OLAP surface).",
)
def cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("string")
    )
    return (
        ev.cube("event_type", "user_bucket")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("user_bucket", F.lit("ALL")).alias("user_bucket"),
            "n",
        )
    )


@register(
    "median_price_by_priority",
    f"""
    SELECT o_orderpriority,
           round(quantile_cont({o_sl("o_totalprice")}, 0.5) / {SCALE}.0, 2) AS median_price,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact median over scaled longs (interpolating percentile; both "
    "engines interpolate midpoints of integer-valued doubles).",
)
def median_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    scaled = F.round(F.col("o_totalprice") * SCALE).cast("long")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile(scaled, F.lit(0.5)) / SCALE, 2).alias("median_price"),
        F.count("*").alias("n"),
    )


@register(
    "shipped_within_30d",
    """
    SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS month,
           COUNT(*) AS n_lines
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate
      AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY 1
    """,
    doc="Timestamp interval arithmetic + range predicate join filter.",
)
def shipped_within_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        )
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            )
        )
        .agg(F.count("*").alias("n_lines"))
    )
