"""Registry entries: scalar-function breadth (date math, fuzzy string
distance, array algebra, outer-join completeness).

The reference's scalar surface is 8 string helpers and zero date/math
functions (SURVEY.md §2.9 — epoch numbers flow untyped end-to-end). A
user replacing it with this engine gets the full Spark SQL function
library; these queries pin the high-traffic corners against DuckDB so
dialect drift (week numbering, day-of-week origin, distance definitions)
is caught, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register


@register(
    "date_math_orders",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(month(o_orderdate) AS INT) AS mon,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2001-01-01') AS INT) AS days_to_2001,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2, 3, 4, 5, 6, 7
    """,
    doc="Date/time function breadth over typed timestamps (the reference "
    "never types its dates — §1.2): year/quarter/month, ISO day-of-week "
    "(Spark dayofweek is Sunday=1, so pinned via the ISO form), "
    "datediff, last_day, add_months. All codegen built-ins.",
)
def date_math_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # Spark dayofweek(): Sunday=1..Saturday=7; ISO dow = Monday=1..Sunday=7.
    iso_dow = ((F.dayofweek("o_orderdate") + 5) % 7) + 1
    return o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mon"),
        iso_dow.cast("int").alias("iso_dow"),
        F.datediff(F.lit("2001-01-01").cast("date"), F.col("o_orderdate"))
        .cast("int")
        .alias("days_to_2001"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus_3m"),
    ).agg(F.count("*").alias("n"))


@register(
    "fuzzy_part_names",
    """
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    doc="Fuzzy near-dup by edit distance: brand-blocked self-join (the "
    "block bounds the quadratic pair space — same blocking discipline "
    "as the minhash/simhash band buckets), Levenshtein <= 2. Two sound "
    "prunes keep the per-pair cost down (r8, 2.25x at sf0.1, output "
    "bit-identical): |len(a)-len(b)| <= 2 rides the join condition "
    "(length difference lower-bounds edit distance), and the distance "
    "itself is the BANDED threshold form (O(k*n) per pair with early "
    "exit, -1 past the band — filtered with the 0..2 range so the "
    "kept column is the true distance). At corpus scale the block key "
    "is the unit of shuffle; never all-pairs.",
)
def fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.operators.util import (
        ensure_parallelism,
    )

    # r12 (guide §2.5 input skew): the probe side of this broadcast
    # self-join is a single-file parquet scan — ONE task evaluating the
    # banded levenshtein over all ~8M brand-blocked pairs on one core.
    # Spreading the scan parallelizes the per-pair kernel (6.5 → 0.9 s at
    # sf0.1). A char-count L1 prune was also A/B'd here and REJECTED: it
    # only halves the pair count (color-word names share letter
    # distributions) and its 16 integer ops/pair cost ≈ the early-exit
    # banded kernel it saves — no win, extra complexity.
    p = ensure_parallelism(
        _t(spark, sf_dir, "part")
    ).select("p_partkey", "p_brand", "p_name")
    a = p.alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey"))
            & (
                F.abs(
                    F.length(F.col("a.p_name")) - F.length(F.col("b.p_name"))
                )
                <= 2
            ),
        )
        .withColumn(
            "dist",
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), 2).cast("int"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= 2))
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            "dist",
        )
    )


@register(
    "array_funcs_orders",
    """
    WITH per_cust AS (
      SELECT o_custkey,
             list_sort(list(DISTINCT o_orderpriority)) AS prios,
             list_sort(list(DISTINCT CAST(year(o_orderdate) AS INT))) AS yrs
      FROM orders GROUP BY o_custkey)
    SELECT o_custkey,
           array_to_string(prios, ',') AS prios,
           len(prios) AS n_prios,
           list_contains(prios, '1-URGENT') AS has_urgent,
           COALESCE(array_to_string(list_sort(list_intersect(prios, ['1-URGENT', '2-HIGH'])), ','), '')
             AS urgent_high,
           yrs[1] AS first_yr,
           yrs[-1] AS last_yr
    FROM per_cust
    """,
    doc="Array algebra on grouped data: collect_set→sort_array (canonical "
    "order so hashes are stable), size, array_contains, "
    "array_intersect, element_at. Arrays stay native through the plan; "
    "the FINAL projection stringifies them via array_join (output "
    "contract: the driver canonicalizer lexsorts rows in pandas and "
    "cannot hash ndarray cells — order_line_ids pattern, "
    "plans/queries.py:270).",
)
def array_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sort_array(F.collect_set("o_orderpriority")).alias("prios"),
        F.sort_array(F.collect_set(F.year("o_orderdate").cast("int"))).alias("yrs"),
    )
    # set-operation output order is engine-defined (DuckDB's
    # list_intersect does NOT keep first-list order) — canonicalize.
    return per.select(
        "o_custkey",
        F.array_join("prios", ",").alias("prios"),
        F.size("prios").alias("n_prios"),
        F.array_contains("prios", "1-URGENT").alias("has_urgent"),
        F.array_join(
            F.sort_array(
                F.array_intersect(
                    "prios", F.array(F.lit("1-URGENT"), F.lit("2-HIGH"))
                )
            ),
            ",",
        ).alias("urgent_high"),
        F.element_at("yrs", 1).alias("first_yr"),
        F.element_at("yrs", -1).alias("last_yr"),
    )


@register(
    "outer_join_daily_traffic",
    """
    WITH o AS (SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS d,
                      COUNT(*) AS n_orders
               FROM orders WHERE o_orderdate >= TIMESTAMP '2001-07-01'
               GROUP BY 1),
         e AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
                      COUNT(*) AS n_events
               FROM events GROUP BY 1)
    SELECT coalesce(o.d, e.d) AS day,
           coalesce(o.n_orders, 0) AS n_orders,
           coalesce(e.n_events, 0) AS n_events
    FROM o FULL OUTER JOIN e ON o.d = e.d
    """,
    doc="FULL OUTER join completeness (the reference has only LEFT — "
    "§2.4): daily order vs event traffic with disjoint date coverage, "
    "null arms coalesced to zero on both sides.",
)
def outer_join_daily_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-07-01").cast("timestamp"))
        .groupBy(
            F.date_format(F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd").alias("d")
        )
        .agg(F.count("*").alias("n_orders"))
    )
    e = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d"))
        .agg(F.count("*").alias("n_events"))
    )
    return (
        o.join(e, o.d == e.d, "full_outer")
        .select(
            F.coalesce(o.d, e.d).alias("day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


@register(
    "nullsafe_join_buckets",
    """
    WITH a AS (
      SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 0
                  THEN NULL
                  ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 END AS bucket,
             COUNT(*) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY 1),
    b AS (
      SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 0
                  THEN NULL
                  ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 END AS bucket,
             COUNT(*) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT a.bucket, a.n_clicks, b.n_purchases
    FROM a JOIN b ON a.bucket IS NOT DISTINCT FROM b.bucket
    """,
    doc="Null-safe equality join (eqNullSafe / IS NOT DISTINCT FROM): the "
    "NULL bucket matches the NULL bucket instead of silently dropping — "
    "the trap in every plain equi-join over nullable keys. Buckets "
    "derived from the JSON props payload, with k%10==0 mapped to NULL.",
)
def nullsafe_join_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    bucket = F.when(k % 10 == 0, F.lit(None).cast("bigint")).otherwise(k % 10)
    a = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n_clicks"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n_purchases"))
    )
    return a.join(b, a.bucket.eqNullSafe(b.bucket)).select(
        a.bucket, "n_clicks", "n_purchases"
    )


@register(
    "regexp_extract_props",
    """
    SELECT event_type,
           CAST(SUM(CAST(num AS BIGINT)) AS BIGINT) AS total,
           COUNT(*) AS n
    FROM (SELECT event_type,
                 unnest(regexp_extract_all(props, '[0-9]+')) AS num
          FROM events)
    GROUP BY event_type
    """,
    doc="regexp_extract_all + explode: pull every number out of the raw "
    "JSON payload string and aggregate — the regex-mining shape for "
    "semi-structured logs where full JSON parsing is overkill.",
)
def regexp_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.explode(
                F.regexp_extract_all("props", F.lit("([0-9]+)"), 1)
            ).alias("num"),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.col("num").cast("bigint")).alias("total"),
            F.count("*").alias("n"),
        )
    )
