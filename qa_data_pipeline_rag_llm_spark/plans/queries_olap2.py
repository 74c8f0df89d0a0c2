"""Registry entries: the remaining TPC-H query shapes (q7-q21).

None of these exist in the reference (its whole relational surface is one
left join + one window — SURVEY.md §2.4-§2.6); together with queries.py /
queries_olap.py they complete the classic 22-query OLAP surface, adapted
to the driver's testdata schema (no partsupp table, no
commitdate/receiptdate/comment columns — each adaptation is noted on the
query).

Scale notes (100 TB stance):
  * Dimension joins (region/nation, and supplier/part at TPC-H's fixed
    dim:fact ratios) are broadcast explicitly; fact-fact joins are left
    to AQE (sort-merge at scale, BHJ when a side proves small).
  * Self-join shapes (q11's total, q15's max) derive the global
    threshold from a broadcast 1-row re-aggregate whose pre-shuffle
    subtree dedupes into the main side's exchange (AQE query-stage
    reuse) — one fact scan AND no single-task window at any key
    cardinality (r04; plan-tested in tests/test_plans.py on the final
    adaptive plan).
  * q21's EXISTS/NOT EXISTS pair collapses into ONE groupBy over the
    order's supplier set instead of two extra lineitem shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import (
    SCALE,
    _exact_sum,
    _sl,
    _t,
    o_exact_sum,
    o_sl,
    register,
)

_O_REV = f"{o_sl('l_extendedprice')} * ({SCALE} - {o_sl('l_discount')})"


def _rev() -> F.Column:
    return _sl("l_extendedprice") * (F.lit(SCALE).cast("long") - _sl("l_discount"))


@register(
    "q7_nation_volume",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           round({o_exact_sum("v", SCALE * SCALE)}, 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             {_O_REV.replace("l_", "l.l_")} AS v
      FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: two-nation shipping volume by year. Nation dims "
    "broadcast; the disjunctive nation-pair predicate lands AFTER both "
    "broadcast joins so Catalyst still prunes fact rows before the "
    "fact-fact joins' shuffles.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    return (
        # nation filters FIRST (broadcast semi effect): supplier/customer
        # shrink to 2/25ths before touching the fact tables.
        s.join(F.broadcast(n1), s.s_nationkey == n1.n1_key)
        .join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(
            c.join(F.broadcast(n2), c.c_nationkey == n2.n2_key),
            F.col("c_custkey") == o.o_custkey,
        )
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(_exact_sum(_rev(), SCALE * SCALE), 2).alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           round(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN CAST(v AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             {_O_REV.replace("l_", "l.l_")} AS v,
             n2.n_name AS nation
      FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY')
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: national market share within a region's ECONOMY "
    "market by order year. part/nation/region broadcast; share = exact "
    "decimal sums divided once at the end (never a per-row double "
    "ratio, which would not hash-match the oracle).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select("n_nationkey", "n_regionkey").join(
        F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    v = _rev().cast("decimal(38,0)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), n1.n_nationkey == c.c_nationkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n2), F.col("n2_key") == s.s_nationkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", v).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(v).cast("double"),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    f"""
    SELECT nation, o_year, round({o_exact_sum("amount", SCALE * SCALE)}, 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INT) AS o_year,
             {_O_REV.replace("l_", "l.l_")}
               - {o_sl("p.p_retailprice")} * {o_sl("l.l_quantity")} AS amount
      FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%gear%')
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and year for '%gear%' "
    "parts. No partsupp in testdata, so cost = p_retailprice*l_quantity "
    "(same join tree, same agg). Exact: revenue and cost are both "
    "per-row long products at SCALE^2 — one subtraction, decimal "
    "accumulate, no division until the final unscale.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = _rev() - _sl("p_retailprice") * _sl("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(_exact_sum(amount, SCALE * SCALE), 2).alias("sum_profit"))
    )


@register(
    "q11_important_parts",
    f"""
    WITH pv AS (
      SELECT l.l_partkey AS p_partkey,
             SUM(CAST({_O_REV.replace("l_", "l.l_")} AS DECIMAL(38,0))) AS value_s
      FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey)
    SELECT p_partkey,
           round(CAST(value_s AS DOUBLE) / {float(SCALE * SCALE)}, 2) AS value
    FROM pv
    WHERE value_s * 1000 > (SELECT SUM(value_s) FROM pv)
    """,
    doc="TPC-H Q11 shape (partsupp -> lineitem value): parts whose revenue "
    "from NATION_3 suppliers exceeds 0.1% of that nation's total. The "
    "global threshold is a broadcast 1-row re-aggregate of the per-part "
    "frame: the identical pre-shuffle subtree (scan + joins + partial "
    "agg + Exchange) dedupes into ONE shuffle stage under Spark's "
    "exchange reuse, so lineitem is still scanned once (gate: "
    "tests/test_plans.py asserts ReusedExchange + single scan in the "
    "FINAL adaptive plan) while the total is a distributed partial-sum "
    "reduce — no single-task window even at billions of parts "
    "(advice/verdict r03). Threshold compare is exact integer "
    "arithmetic (value·1000 > total), immune to FP sum order.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    pv = (
        li.join(
            F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_rev().cast("decimal(38,0)")).alias("value_s"))
    )
    total = pv.agg(F.sum("value_s").alias("total_s"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_s") * 1000 > F.col("total_s"))
        .select(
            "p_partkey",
            F.round(
                F.col("value_s").cast("double") / float(SCALE * SCALE), 2
            ).alias("value"),
        )
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
    bench=True,
    doc="TPC-H Q13 shape: orders-per-customer histogram via conditioned "
    "LEFT join (priority filter stands in for the comment NOT LIKE). "
    "COUNT(o_orderkey) counts non-null matches only; second agg is tiny.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round({o_exact_sum(_O_REV, SCALE * SCALE)}, 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape: top supplier(s) by quarterly revenue. The MAX "
    "threshold is a broadcast 1-row re-aggregate of the per-supplier "
    "frame; exchange reuse dedupes the identical pre-shuffle subtree so "
    "lineitem is scanned once (gate: tests/test_plans.py asserts "
    "ReusedExchange + single scan in the FINAL adaptive plan), and the "
    "max is a distributed partial reduce — no single-task window even "
    "at extreme supplier cardinality (advice/verdict r03). Catalyst "
    "folds the equality filter into a BroadcastHashJoin on "
    "total_revenue = mx. Date predicate pushed to parquet.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
        # explicit, though never null in TPC-H: the downstream supplier
        # equi-join infers isnotnull(l_suppkey) into the MAIN branch
        # only, which would make the two exchange subtrees non-identical
        # and silently defeat the reuse this query's single-scan
        # guarantee rests on
        & F.col("l_suppkey").isNotNull()
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(_exact_sum(_rev(), SCALE * SCALE), 2).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (partsupp -> lineitem): distinct suppliers per "
    "(brand, type, size) outside an excluded brand/type. Part dim "
    "broadcast after its selective IN/<> prune; distinct-count is the "
    "only shuffle.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_heavy_part_suppliers",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_4'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'small%'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) > 80)
    """,
    doc="TPC-H Q20 shape: NATION_4 suppliers that moved >80 units of any "
    "'small%' part (availability threshold stands in for partsupp "
    "availqty). IN-subquery = agg + LEFT SEMI join, duplicate-safe "
    "(SURVEY.md P8).",
)
def q20_heavy_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = _t(spark, sf_dir, "lineitem")
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 80)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_waiting_suppliers",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
      JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape: suppliers solely responsible for late multi-"
    "supplier 'F' orders (late = shipped >60 days after order date; "
    "testdata has no receipt/commit dates). The EXISTS / NOT EXISTS "
    "pair is computed as ONE per-order supplier profile (distinct "
    "suppliers, distinct late suppliers) joined back — one extra "
    "shuffle instead of two correlated-subquery re-scans of lineitem.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("is_late")
    )
    # Per-order profile: how many distinct suppliers total / late.
    profile = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    # A line survives iff: it is late, its order has >1 supplier (EXISTS),
    # and it is the ONLY late supplier (NOT EXISTS another late one).
    return (
        lo.filter("is_late")
        .join(profile, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
