"""Registry entries: wider OLAP/relational surface (SURVEY.md §7 stage 2).

None of these shapes exist in the reference (single join + one window is
its whole relational repertoire — §2.4-2.6); they complete the generic
query capability the north star demands, each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.text import (
    clean_html_bs4,
    html_strip,
    o_html_strip,
    strip_id_prefix,
)
from qa_data_pipeline_rag_llm_spark.operators.ranking import top_k_per_group
from qa_data_pipeline_rag_llm_spark.plans.queries import (
    SCALE,
    _exact_sum,
    _limb_sum,
    _money,
    _sl,
    _t,
    o_exact_sum,
    o_limb_sum,
    o_money,
    o_sl,
    register,
)

# Shared revenue expression: l_extendedprice * (1 - l_discount), exact via
# scaled longs (see queries.py SCALE rationale).
_O_REV = f"{o_sl('l_extendedprice')} * ({SCALE} - {o_sl('l_discount')})"


def _rev():
    from pyspark.sql import functions as _F

    return _sl("l_extendedprice") * (_F.lit(SCALE).cast("long") - _sl("l_discount"))


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
    "q2_shape_min_cost_supplier",
    """
    SELECT DISTINCT p.p_partkey, p.p_brand, p.p_type,
           s.s_name, s.s_acctbal, n.n_name,
           l.l_extendedprice AS price
    FROM part p, lineitem l, supplier s, nation n, region r
    WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'EUROPE' AND p.p_size = 15
      AND l.l_extendedprice = (
        SELECT MIN(l2.l_extendedprice)
        FROM lineitem l2, supplier s2, nation n2, region r2
        WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'EUROPE')
    """,
    doc="TPC-H Q2 shape (testdata has no partsupp, so lineitem acts as "
    "the supply relation — documented in COVERAGE.md): suppliers in a "
    "region offering a size-15 part at that part's REGIONAL minimum "
    "price. The oracle states the classic correlated scalar subquery; "
    "the Spark plan DECORRELATES it into one windowed min over the "
    "already-filtered join (single lineitem scan, dims broadcast) — the "
    "rescan-per-row the naive translation would pay is the classic Q2 "
    "blowup at scale.",
)
def q2_shape_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("__min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("__min_price"))
        .select(
            "p_partkey",
            "p_brand",
            "p_type",
            "s_name",
            "s_acctbal",
            "n_name",
            F.col("l_extendedprice").alias("price"),
        )
        .distinct()
    )


@register(
    "string_funcs_documents",
    f"""
    SELECT doc_id,
           regexp_replace('t3_' || CAST(doc_id AS VARCHAR), '^t3_', '') AS stripped_id,
           {o_html_strip("'<p>' || substr(text, 1, 30) || '</p> &amp; more'")} AS cleaned,
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
    "clean_html_arrow_documents",
    """
    SELECT doc_id,
           substr(regexp_replace(coalesce(text, ''), '[&<>]', '', 'g'), 1, 40)
             || ' & ''tail''' AS cleaned
    FROM documents
    """,
    doc="F1 full-parser path: the reference's BS4 clean_html UDF "
    "(STACK-Nettoyage-Posts.py:77-87) as an Arrow-batched pandas_udf "
    "(BeautifulSoup when importable, stdlib html.parser otherwise — a "
    "real parser either way: nesting, hex/named/numeric entities). "
    "Oracle-checkable because the fixture HTML is built from text "
    "sanitized of &<> — the parser's output is then a pure string "
    "expression both engines can state. Tag-soup divergences vs the "
    "SQL path are pinned in tests/test_text_html.py.",
)
def clean_html_arrow_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    base = F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), "[&<>]", "")
    fake_html = F.concat(
        F.lit("<div><p>"),
        F.substring(base, 1, 40),
        F.lit("</p> &amp; &#x27;tail&#39;</div>"),
    )
    return d.select("doc_id", clean_html_bs4(fake_html).alias("cleaned"))


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


@register(
    "q6_forecast_revenue",
    f"""
    SELECT round({o_exact_sum(f"{o_sl('l_extendedprice')} * {o_sl('l_discount')}", SCALE * SCALE)}, 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND {o_sl('l_discount')} BETWEEN 500 AND 700
      AND l_quantity < 24
    """,
    bench=True,
    doc="TPC-H Q6 shape: pure scan + selective predicates + global agg. The "
    "predicate set reaches the parquet scan as PushedFilters (shipdate "
    "min/max prune row groups); no shuffle beyond the final 1-row reduce.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_scaled = _sl("l_discount")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & disc_scaled.between(500, 700)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                _exact_sum(_sl("l_extendedprice") * disc_scaled, SCALE * SCALE), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name,
           round({o_limb_sum(_O_REV.replace("l_", "l.l_"), SCALE * SCALE, 2)}, 2) AS revenue,
           n.n_name AS nation
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    bench=True,
    doc="TPC-H Q10 shape: fact-fact join + broadcast dims + agg + "
    "deterministic top-20. Orders filter applied before the join so the "
    "shuffled side shrinks first; nation broadcast.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.round(_limb_sum(_rev(), SCALE * SCALE, 2), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q12_late_lines_by_status",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape (no l_shipmode column in testdata — grouped by "
    "l_linestatus instead): join + conditional aggregation over a "
    "late-shipment interval predicate.",
)
def q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    f"""
    SELECT round(100.0 * ({o_exact_sum(f"CASE WHEN p.p_type = 'PROMO' THEN {_O_REV.replace('l_', 'l.l_')} ELSE 0 END", SCALE * SCALE)})
                 / ({o_exact_sum(_O_REV.replace("l_", "l.l_"), SCALE * SCALE)}), 4) AS promo_pct,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    doc="TPC-H Q14 shape: promo-revenue ratio via conditional exact sums "
    "(p_type = 'PROMO' — testdata types are single words, no 'PROMO%%' "
    "prefix needed).",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    # part scales with the corpus — no broadcast hint (AQE decides).
    joined = li.join(p, p.p_partkey == li.l_partkey)
    promo_rev = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0).cast("long"))
    return joined.agg(
        F.round(
            (F.lit(100.0) * _exact_sum(promo_rev, SCALE * SCALE))
            / _exact_sum(_rev(), SCALE * SCALE),
            4,
        ).alias("promo_pct"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q18_large_orders",
    f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_totalprice,
           {o_money("l.l_quantity")} AS sum_qty
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST({o_sl('l_quantity')} AS DECIMAL(38,0))) > 250 * {SCALE}
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: HAVING subquery as a semi join on the "
    "pre-aggregated fact (the aggregate is computed once and semi-joined, "
    "not recomputed per row).",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_sl("l_quantity").cast("decimal(38,0)")).alias("qty_scaled"))
        .filter(F.col("qty_scaled") > 250 * SCALE)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_money("l_quantity").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT round({o_exact_sum(_O_REV.replace("l_", "l.l_"), SCALE * SCALE)}, 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_type  = 'PROMO'   AND l.l_quantity >= 20)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive band predicates across "
    "both join sides — Catalyst extracts the common p_partkey equi-key so "
    "this stays a broadcast hash join with a residual OR filter, not a "
    "nested-loop join.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") <= 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 20)
    )
    return (
        # part scales with the corpus — no broadcast hint (AQE decides).
        li.join(p, p.p_partkey == li.l_partkey)
        .filter(cond)
        .agg(
            F.round(_exact_sum(_rev(), SCALE * SCALE), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "window_funcs_orders",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(RANK() OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           CAST(NTILE(10) OVER w AS INTEGER) AS decile,
           round(PERCENT_RANK() OVER w, 6) AS pct_rank,
           round(CUME_DIST() OVER w, 6) AS cdist,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LEAD(o_orderkey) OVER w AS next_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="Ranking-window surface in one pass: rank/dense_rank/ntile/"
    "percent_rank/cume_dist/first_value/lead over a fully-ordered "
    "partition (deterministic tie-break; §2.6 extension — the reference "
    "uses only row_number).",
)
def window_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.lead("o_orderkey").over(w).alias("next_key"),
    )


@register(
    "q17_small_quantity_revenue",
    f"""
    WITH pa AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST({o_sl('l_quantity')} AS DECIMAL(38,0))) AS qty_sum
      FROM lineitem GROUP BY l_partkey)
    SELECT round({o_exact_sum(o_sl('l.l_extendedprice'), SCALE)} / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND 2 * {o_sl('l.l_quantity')} * pa.n < pa.qty_sum
    """,
    doc="TPC-H Q17 shape: correlated avg-quantity subquery as a "
    "pre-aggregated join; the below-half-average predicate compares in "
    "pure integer arithmetic (2·qty·n < Σqty) — no float average, no "
    "cross-engine drift.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.count("*").alias("n"),
        F.sum(_sl("l_quantity").cast("decimal(38,0)")).alias("qty_sum"),
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .join(pa, F.col("pa_partkey") == li.l_partkey)
        .filter(
            (F.lit(2) * _sl("l_quantity") * F.col("n")).cast("decimal(38,0)")
            < F.col("qty_sum")
        )
        .agg(
            F.round(_exact_sum(_sl("l_extendedprice"), SCALE) / 7.0, 2).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q22_idle_rich_customers",
    f"""
    WITH avg_bal AS (
      SELECT {o_exact_sum(o_sl('c_acctbal'), SCALE)} / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0)
    SELECT c.c_nationkey,
           COUNT(*) AS n_custs,
           round({o_exact_sum(o_sl('c.c_acctbal'), SCALE)}, 2) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape: global scalar subquery (exact decimal average, "
    "no float-sum drift) + anti join on conditioned orders, grouped by "
    "nation (testdata has no phone-prefix column).",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_custkey").alias("c_custkey"))
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((_exact_sum(_sl("c_acctbal"), SCALE) / F.count("*")).alias("a"))
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    return (
        rich.join(o, "c_custkey", "anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(_exact_sum(_sl("c_acctbal"), SCALE), 2).alias("total_bal"),
        )
    )
