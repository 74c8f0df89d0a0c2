"""The query registry — single source of truth for the engine's surface.

Every implemented operator from SURVEY.md §2 (plus the training-data
extensions) appears here as a :class:`QuerySpec`:

  * ``spark``  — (SparkSession, sf_dir) → DataFrame, built from the
    operator library. This is what the driver smoke-runs and benches.
  * ``oracle`` — equivalent ANSI SQL for DuckDB over the same parquet
    views (None only for genuinely non-SQL-expressible ops; the driver
    then records a weaker rows-only check).
  * ``bench``  — include in bench.py's headline set.

Determinism contract: every query's output is a total function of its
input (explicit tie-breaks, sorted arrays, decimal-exact aggregation of
doubles, rounded float outputs) so order-insensitive value-hash compares
are stable. Column names are identical on both sides by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.catalog import load_table

# Money/measure columns arrive as doubles; all sums are EXACT and
# order-independent in both engines: scale to integers (round(x·10^4) —
# TPC-H money has 4 fractional digits), multiply/subtract as longs (simple
# integer codegen — nested DECIMAL multiplies make Spark generate enormous
# whole-stage code that takes ~45 s to Janino-compile), accumulate into
# DECIMAL(38,0) (no overflow at any corpus size), cast to double once at
# the end. Per-row long products stay < 2^63 for prices < ~9·10^6.
SCALE = 10_000


def _sl(c) -> F.Column:
    """Scaled-long money value: round(x·10^4) as BIGINT."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col * SCALE).cast("long")


def _exact_sum(scaled_col: F.Column, scale: int) -> F.Column:
    """Exact decimal sum of a scaled-long expr, as un-scaled double."""
    return F.sum(scaled_col.cast("decimal(38,0)")).cast("double") / F.lit(
        float(scale)
    )


def _money(c) -> F.Column:
    """Exact sum of a double money column, emitted as a rounded double."""
    return F.round(_exact_sum(_sl(c), SCALE), 2)


def o_sl(c: str) -> str:
    """Oracle twin of _sl."""
    return f"CAST(round({c} * {SCALE}) AS BIGINT)"


def o_exact_sum(scaled_expr: str, scale: int) -> str:
    """Oracle twin of _exact_sum."""
    return f"CAST(SUM(CAST({scaled_expr} AS DECIMAL(38,0))) AS DOUBLE) / {float(scale)}"


def o_money(c: str) -> str:
    """Oracle twin of _money."""
    return f"round({o_exact_sum(o_sl(c), SCALE)}, 2)"


# ---------------------------------------------------------------------------
# Limb-split exact sums: the fast path for agg-heavy full scans.
#
# decimal(38,0) sums are order-independent and overflow-proof, but on the
# q1 profile they cost ~2× the whole query (measured at sf0.1: 1.28 s
# with decimal sums vs 0.63 s with long sums, scan+count floor 0.28 s —
# Spark's Decimal aggregation buffer leaves the primitive-long codegen
# path). The scaled-long terms themselves fit comfortably in int64; only
# their SUM overflows. So: split each term into base-2^23 limbs, sum
# each limb as a plain long (vectorized, codegen), and recombine once
# per GROUP. Bounds, with N = row count and limb base P = 2^23:
#   * each limb < P, so a limb sum < P·N — safe for N < 2^63/2^23 ≈
#     1.1e12 rows (TPC-H sf ~180k ≈ 180 TB of lineitem);
#   * k limbs cover per-row terms < 2^(23k): k=2 → 7.0e13, k=3 → 5.9e20.
# The recombination Σhi·P² + Σmid·P + Σlo runs in double — EXACT below
# 2^53 (every driver/test scale), and above it a deterministic IEEE
# rounding that the oracle twin replays op-for-op (both engines cast
# their exact integer limb sums to double, then evaluate the identical
# polynomial), so cross-engine hashes stay bit-identical at any scale.
# Single-limb callers (terms < P) can just F.sum the long directly —
# same N bound.
LIMB = 1 << 23


def _limb_sum(scaled_col: F.Column, scale: int, limbs: int) -> F.Column:
    """Exact limb-split sum of a NON-NEGATIVE scaled-long expr, as
    un-scaled double. Limbs are cut with shiftright/bitwiseAND — exact
    long arithmetic at any magnitude (a double division here would
    corrupt terms above 2^53). Non-negativity is required: arithmetic
    shift is floor division while ``%`` is truncated, and the two only
    agree on non-negative inputs (q1's money terms all are)."""
    total = None
    for i in range(limbs):
        part = scaled_col
        if i > 0:
            part = F.shiftright(part, 23 * i)
        if i < limbs - 1:
            part = part.bitwiseAND(F.lit(LIMB - 1))
        term = F.sum(part).cast("double") * float(LIMB ** i)
        total = term if total is None else total + term
    return total / F.lit(float(scale))


def o_limb_sum(scaled_expr: str, scale: int, limbs: int) -> str:
    """Oracle twin of _limb_sum (DuckDB ``>>``/``&`` on BIGINTs)."""
    terms = []
    for i in range(limbs):
        part = scaled_expr
        if i > 0:
            part = f"(({part}) >> {23 * i})"
        if i < limbs - 1:
            part = f"(({part}) & {LIMB - 1})"
        terms.append(f"CAST(SUM({part}) AS DOUBLE) * {float(LIMB ** i)}")
    return f"({' + '.join(terms)}) / {float(scale)}"


# Exact-rational averages (ADVICE r05, queries.py:170): rounding the
# DOUBLE quotient ties Spark's shortest-string BigDecimal HALF_UP against
# DuckDB's scaled-float rounding near .00005 boundaries. Instead the limb
# sums recombine as EXACT integers (DECIMAL(38,0) / HUGEINT) and
# round(S/(SCALE·N), 4) with SCALE=10^4 becomes pure integer arithmetic:
#   r4 = (2·S + N) div (2·N)   (half-up on a positive exact rational)
# and the displayed double is r4/10^4 — both engines evaluate the same
# integer polynomial, so the result is bit-identical at ANY scale.


def s_limb_sum_int(scaled_expr: str, limbs: int) -> str:
    """Spark-SQL exact integer limb recombination (DECIMAL(38,0))."""
    terms = []
    for i in range(limbs):
        part = scaled_expr
        if i > 0:
            part = f"shiftright({part}, {23 * i})"
        if i < limbs - 1:
            part = f"(({part}) & {LIMB - 1})"
        terms.append(f"CAST(SUM({part}) AS DECIMAL(38,0)) * {LIMB ** i}")
    return f"({' + '.join(terms)})"


def o_limb_sum_int(scaled_expr: str, limbs: int) -> str:
    """Oracle twin of s_limb_sum_int (HUGEINT is DuckDB's exact int128)."""
    terms = []
    for i in range(limbs):
        part = scaled_expr
        if i > 0:
            part = f"(({part}) >> {23 * i})"
        if i < limbs - 1:
            part = f"(({part}) & {LIMB - 1})"
        terms.append(f"CAST(SUM({part}) AS HUGEINT) * {LIMB ** i}")
    return f"({' + '.join(terms)})"


def s_avg4(scaled_expr: str, limbs: int) -> str:
    """round(avg, 4) of a SCALE-scaled term as exact integer math
    (Spark side). Requires the term scale to equal SCALE=10^4 so the
    rounding quantum cancels: round(S/(SCALE·N)·10^4 + 1/2) = (2S+N) div 2N."""
    s = s_limb_sum_int(scaled_expr, limbs)
    n = "CAST(COUNT(*) AS DECIMAL(38,0))"
    return f"CAST((2 * {s} + {n}) div (2 * {n}) AS DOUBLE) / 10000.0"


def o_avg4(scaled_expr: str, limbs: int) -> str:
    """Oracle twin of s_avg4 (// is DuckDB integral division)."""
    s = o_limb_sum_int(scaled_expr, limbs)
    n = "CAST(COUNT(*) AS HUGEINT)"
    return f"CAST((2 * {s} + {n}) // (2 * {n}) AS DOUBLE) / 10000.0"


def s_sumd(scaled_expr: str, scale: int, limbs: int) -> str:
    """round(sum, 2) of a scaled term via the SAME exact-int limb
    recombination s_avg4 uses, displayed as double (Spark side). Sharing
    one integer S between sum_x and avg_x makes the pair a common
    subexpression of the final-agg projection, and the displayed value
    is the IEEE rounding of an EXACT integer — the oracle twin casts the
    identical integer, so the double (and its round-2) match bit-for-bit
    at ANY scale, with no double-polynomial replay needed (VERDICT r06
    #5; A/B at sf0.1 in SCALING.md: 0.49 s vs 0.58 s for the r6 mixed
    double/decimal recombination)."""
    s = s_limb_sum_int(scaled_expr, limbs)
    return f"round(CAST({s} AS DOUBLE) / {float(scale)}, 2)"


def o_sumd(scaled_expr: str, scale: int, limbs: int) -> str:
    """Oracle twin of s_sumd (HUGEINT recombination, same display)."""
    s = o_limb_sum_int(scaled_expr, limbs)
    return f"round(CAST({s} AS DOUBLE) / {float(scale)}, 2)"


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    bench: bool = False
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, bench: bool = False, doc: str = ""
) -> Callable:
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            # a silent overwrite means one of two same-named queries never
            # runs — and the driver's correctness sweep can't notice
            raise ValueError(f"duplicate query registration: {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, bench, doc)
        return fn

    return wrap


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# =====================================================================
# Relational core (TPC-H-shaped; SURVEY.md §7 stage 2 generic surface)
# =====================================================================


# Spark SQL shares o_sl's text — round()/CAST parse identically in both
# dialects, so the avg4/sumd expressions are built from ONE scaled-term
# string per measure.
_SL_QTY = o_sl("l_quantity")
_SL_PRICE = o_sl("l_extendedprice")
_SL_DISC = o_sl("l_discount")
_SL_DISC_PRICE = f"{_SL_PRICE} * ({SCALE} - {_SL_DISC})"
_SL_CHARGE = f"{_SL_DISC_PRICE} * ({SCALE} + {o_sl('l_tax')})"


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {o_sumd(_SL_QTY, SCALE, 1)} AS sum_qty,
           {o_sumd(_SL_PRICE, SCALE, 2)} AS sum_base_price,
           {o_sumd(_SL_DISC_PRICE, SCALE * SCALE, 2)} AS sum_disc_price,
           {o_sumd(_SL_CHARGE, SCALE**3, 3)} AS sum_charge,
           {o_avg4(_SL_QTY, 1)} AS avg_qty,
           {o_avg4(_SL_PRICE, 2)} AS avg_price,
           {o_avg4(_SL_DISC, 1)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    doc="TPC-H Q1 shape: full-scan groupBy with 8 aggregates "
    "(A-family). Aggregation runs on the limb-split long fast path "
    "(s_limb_sum_int — per-limb SUMs stay primitive-long codegen, "
    "exact, order-independent, overflow-safe past 1e12 rows): qty/disc "
    "terms fit one limb, price and disc_price two, charge three. Every "
    "sum_*/avg_* column recombines the SAME exact DECIMAL(38,0) limb "
    "integer S (VERDICT r06 #5 — one shared aggregate per measure, "
    "10 buffers total), displayed as round(CAST(S AS DOUBLE)/scale, 2); "
    "avg_* rounds on the EXACT rational r4 = (2S+N) div 2N (ADVICE "
    "r05). The oracle recombines the identical integer in HUGEINT, so "
    "both engines IEEE-round the same exact value — bit-identical at "
    "ANY scale, no double-polynomial replay needed.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr(s_sumd(_SL_QTY, SCALE, 1)).alias("sum_qty"),
        F.expr(s_sumd(_SL_PRICE, SCALE, 2)).alias("sum_base_price"),
        F.expr(s_sumd(_SL_DISC_PRICE, SCALE * SCALE, 2)).alias("sum_disc_price"),
        F.expr(s_sumd(_SL_CHARGE, SCALE**3, 3)).alias("sum_charge"),
        F.expr(s_avg4(_SL_QTY, 1)).alias("avg_qty"),
        F.expr(s_avg4(_SL_PRICE, 2)).alias("avg_price"),
        F.expr(s_avg4(_SL_DISC, 1)).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


_O_REV = f"{o_sl('l_extendedprice')} * ({SCALE} - {o_sl('l_discount')})"


def _rev() -> F.Column:
    return _sl("l_extendedprice") * (F.lit(SCALE).cast("long") - _sl("l_discount"))


@register(
    "q3_top_orders",
    f"""
    SELECT o.o_orderkey,
           round({o_limb_sum(_O_REV.replace("l_", "l.l_"), SCALE * SCALE, 2)}, 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS priority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    bench=True,
    doc="TPC-H Q3 shape: 3-way join + agg + deterministic top-10 "
    "(J1/O-family). Revenue sums ride the limb-split long fast path "
    "(_limb_sum, 2 limbs — the q1 r5 rewrite): per-group decimal "
    "buffers left codegen and dominated the post-join agg.",
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(_limb_sum(_rev(), SCALE * SCALE, 2), 2).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    f"""
    SELECT n.n_name AS nation,
           round({o_limb_sum(_O_REV.replace("l_", "l.l_"), SCALE * SCALE, 2)}, 2) AS revenue
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY n.n_name
    """,
    bench=True,
    doc="TPC-H Q5 shape: star join through broadcast dims → fact agg.",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        # customer/orders scale with the corpus — no broadcast hint; AQE
        # picks BHJ when a side is actually small. region/nation are
        # bounded (5/25 rows) so the hint is always safe.
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(_limb_sum(_rev(), SCALE * SCALE, 2), 2).alias("revenue"))
    )


@register(
    "orders_by_month",
    """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           COUNT(*) AS n_orders,
           {total} AS total
    FROM orders
    GROUP BY 1
    """.format(total=o_money("o_totalprice")),
    doc="Timestamp bucketing agg (the reference keeps dates untyped — §1.2).",
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            _money("o_totalprice").alias("total"),
        )
    )


@register(
    "topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders) WHERE rank <= 3
    """,
    bench=True,
    doc="W1: top-k per group with deterministic tie-break "
    "(REDDIT-Nettoyage-Comms.py:63-67 shape).",
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.operators.ranking import top_k_per_group

    return top_k_per_group(
        _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        group_by=["o_custkey"],
        order_by=[F.desc("o_totalprice"), F.col("o_orderkey")],
        k=3,
        keep_rank=True,
    ).withColumn("rank", F.col("rank").cast("int"))


@register(
    "order_line_ids",
    """
    SELECT o.o_orderkey,
           COALESCE(array_to_string(list_sort(list(l.l_linenumber)), ','), '') AS line_ids,
           COUNT(l.l_orderkey) AS n_lines
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey
    """,
    bench=True,
    doc="J1+A1: parent ⟕ sorted collect_list of child ids "
    "(REDDIT-jointure.py:67-75 shape, order pinned per SURVEY §2.5).",
)
def order_line_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.array_join(F.sort_array(F.collect_list("l_linenumber")), ",").alias("line_ids"),
        F.count("*").alias("n_lines"),
    )
    return (
        o.join(grouped, o.o_orderkey == grouped.l_orderkey, "left")
        .select(
            "o_orderkey",
            F.coalesce("line_ids", F.lit("")).alias("line_ids"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        )
    )


@register(
    "semi_customers_urgent",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    doc="P8/J2: left semi join replacing the reference's pandas isin "
    "(PLATFORM-GenerationLLM.py:163-164).",
)
def semi_customers_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.operators.joins import semi_join

    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return semi_join(c, o, "c_custkey").select("c_custkey", "c_name")


@register(
    "anti_customers_no_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    doc="Anti join (generic surface, SURVEY §7 stage 2).",
)
def anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.operators.joins import anti_join

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return anti_join(c, o, "c_custkey").select("c_custkey", "c_name")


@register(
    "union_dedup_parts",
    """
    SELECT DISTINCT p_brand, p_type FROM (
      SELECT p_brand, p_type FROM part WHERE p_size >= 40
      UNION ALL
      SELECT p_brand, p_type FROM part WHERE p_retailprice > 1500
    )
    """,
    doc="U1: unionByName + dedup (PLATFORM-Merge.py:56; dedup per README.md:48).",
)
def union_dedup_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    a = p.filter(F.col("p_size") >= 40).select("p_brand", "p_type")
    b = p.filter(F.col("p_retailprice") > 1500).select("p_brand", "p_type")
    return a.unionByName(b).distinct()


@register(
    "notin_filter_events",
    """
    SELECT event_type, COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events WHERE event_type NOT IN ('error', 'view')
    GROUP BY event_type
    """,
    doc="P3: NOT-IN filter (REDDIT-Nettoyage-Comms.py:49 shape) + distinct count.",
)
def notin_filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(~F.col("event_type").isin("error", "view"))
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "regex_filter_documents",
    """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE NOT regexp_matches(text, 'hash (join|agg)') AND lang = 'en'
    """,
    doc="P4: regex anti-filter (REDDIT-Nettoyage-Comms.py:76-88 shape; "
    "pattern kept to the Java∩RE2 dialect).",
)
def regex_filter_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.filter(
        ~F.col("text").rlike("hash (join|agg)") & (F.col("lang") == "en")
    ).select("doc_id", "lang", "n_chars")


@register(
    "point_lookup_order",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM orders)
    """,
    doc="P7: equality point lookup (PLATFORM-GenerationLLM.py:66 shape).",
)
def point_lookup_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_pl")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM __orders_pl
        WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM __orders_pl)
        """
    )


@register(
    "rollup_lineitem",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           {sum_qty} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """.format(sum_qty=o_money("l_quantity")),
    doc="Grouping-set rollup (generic OLAP surface; absent in reference §2.5).",
)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(_money("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "pivot_user_events",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
    doc="Pivot (generic OLAP surface).",
)
def pivot_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy("user_id").pivot("event_type", types).count()
    return out.select(
        "user_id", *[F.coalesce(t, F.lit(0)).alias(t) for t in types]
    )


@register(
    "sessionize_events",
    """
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT user_id, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, user_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM g
    )
    SELECT user_id,
           COUNT(DISTINCT sess_id) AS n_sessions,
           COUNT(*) AS n_events,
           CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id
    """,
    bench=True,
    doc="Sessionization via lag+cumsum (streaming-adjacent batch pattern; "
    "extension — reference has no event-time ops, SURVEY §2.11).",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_order))
    with_flag = ev.withColumn(
        "new_sess", F.when(gap > 1800 * 1_000_000, 1).otherwise(0)
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = with_flag.withColumn("sess_id", F.sum("new_sess").over(w_cum))
    return sess.groupBy("user_id").agg(
        F.countDistinct("sess_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias(
            "total_value"
        ),
    )


@register(
    "events_hourly",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling event-time window (batch form; streaming twin in "
    "streaming/events.py shares this shape).",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias(
            "total_value"
        ),
    )


# ---------------------------------------------------------------------
# Extension families register on import (bottom import: `register`/`_t`
# must already be defined; keeps one REGISTRY for __spark_entry__/tests).
from qa_data_pipeline_rag_llm_spark.plans import queries_text  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_vector  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_streaming  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_pipeline  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_olap  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_olap2  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_ingest  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_temporal  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_scale  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_udtf_sketch  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_serving  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_funcs  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_reshape  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_hof  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_corpus  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_llmdata  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_stats  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_sampling  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_packing  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_pandas_ops  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_graph_profile  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_funnel  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_retrieval  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_diff_mining  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_curation  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_audit  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_sft  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_contrib  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_evals  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_maintenance  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_experiment  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_linalg  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_scoring  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_robust  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_mergeable  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_monitoring  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_labelqual  # noqa: E402,F401
from qa_data_pipeline_rag_llm_spark.plans import queries_lmfilter  # noqa: E402,F401


# ---------------------------------------------------------------------------
# Deterministic registry ordering for external verification sweeps.
#
# The driver's correctness sweep samples a PREFIX of the registry, so the
# iteration order decides which queries get an independent cross-engine
# check each round. Order by verification debt: queries the recorded
# CORRECTNESS artifacts have never covered come first (oracled before
# rows-only), already-verified ones last — each round's artifact then
# rotates fresh coverage in automatically. The §2 ingest/serving spine
# (the reference's entry points 1 and 3: main-spark.py:4-10,
# app2.py:133-247) is pinned to the very front (VERDICT r02 #3: never
# verified in two rounds).


_PINNED_FIRST = [
    "ingest_normalize_posts",
    "ingest_keep_first",
    "flatten_comment_tree",
    "csv_roundtrip_documents",
    "catalog_tables",
    "rag_generate",
]

# This round's new operator families register LAST (module import order)
# and would otherwise sit at the tail of the never-verified bucket, past
# the driver's 50-query sample prefix. Pin them into the second tier so
# each round's additions get an independent cross-engine row while fresh;
# pins auto-demote once an artifact records them (see bucket()).
_PINNED_NEW = [
    "remove_dup_spans_documents",
    "ngram_novelty_by_source",
    "token_entropy_by_source",
    "hard_negatives_embeddings",
    "bpe_merge_pairs_documents",
    "source_temperature_weights",
    "padding_waste_by_batching",
    "streaming_quality_gate",
    "retrieval_eval_bm25",
    "eval_recall_curve_bm25",
    "retrieval_overlap_lex_vec",
    "k_anonymity_customers",
    "scd2_user_state_events",
    "peak_concurrency_daily",
    "pit_state_at_purchase",
    "incremental_scd2_merge_events",
    "retrieval_eval_cosine",
    "streaming_scd2_closed_versions",
    "vector_store_audit",
    "bm25_batch_search_documents",
    # round 4 additions
    "runtime_filter_join_revenue",
    "mmr_diversified_retrieval",
    "dpp_pruned_daily_events",
    "lsh_band_eval_documents",
    "bucketed_join_order_lines",
    # round 5 additions (table-maintenance family)
    "compaction_plan_orders",
    "psi_drift_events",
    "cdc_versioned_merge_orders",
    "heavy_hitters_events",
    "cuped_ab_events",
    "decayed_leaderboard_events",
    "gram_matrix_embeddings",
    "prefix_filter_jaccard_pairs",
    "seasonal_anomalies_events",
    "ivf_cell_balance_audit",
    "zipf_slope_by_source",
    "l_diversity_customers",
    "auc_score_events",
    "brier_ece_events",
    "calibration_bins_events",
    "chi2_tokens_by_source",
    "cusum_changepoint_events",
    "trimmed_mean_events",
    "equidepth_bounds_events",
    "hll_union_users_events",
    "weighted_reservoir_documents",
    "streaming_hll_users",
    "deletion_cascade_customers",
    "hll_vocab_overlap_by_source",
    "hll_rollup_daily_users",
    "cms_user_counts_events",
    "cbo_stats_join_keys",
    "multimodal_audio_frames",
    "multimodal_resize_documents",
    "bloom_membership_customers",
    # VERDICT r04 #1's latent third instance: fixed alongside the two
    # err'd array-output queries (posting stringified) but never
    # driver-rowed — pin so the FIX gets verified, not just the bug's
    # siblings
    "inverted_index_documents",
]


# Spot-recheck rotation (VERDICT r03 #7): a query verified once could
# silently regress and never be re-sampled. From the round after the
# fourth artifact onward (i.e. once the r04 sweep has burned the bulk
# of the verification debt), the sample prefix becomes 40 debt slots +
# RECHECKS slots of the OLDEST-verified queries (first clean round,
# then registration order) — so old verifications age back into the
# driver's 50-query window at ~10/round while fresh debt still drains
# at 40/round. Earlier rounds keep the full-debt prefix: burning
# never-verified queries dominates while >50 remain.
DEBT_SLOTS = 40
RECHECKS = 10
_RECHECK_FROM_ARTIFACTS = 4
# Post-debt regime (VERDICT r07 ask #6): these constants do NOT idle the
# window when debt/stale drain — the interleave in `_ordered_names`
# (debt[:DEBT_SLOTS] + done[:RECHECKS] + debt[DEBT_SLOTS:] + done[RECHECKS:])
# degenerates to `debt + done-sorted` whenever |debt| ≤ DEBT_SLOTS, so
# every unused debt slot is a recheck slot automatically: with debt and
# stale at 0 the driver's 50-query prefix is the 50 OLDEST verifications
# and the full 279-query registry re-rows on a ⌈279/50⌉ = 6-round cycle,
# not a 10/round (~28-round) one. DEBT_SLOTS only binds under heavy debt
# (>40, keeping 10 guaranteed recheck slots); RECHECKS only binds there
# too. Pinned by tests/test_recheck_rotation.py's post-debt tests.


def _load_artifacts() -> list[dict]:
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    out = []
    for art in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            out.append(json.loads(art.read_text()))
        except Exception:  # artifact malformed/absent — order still total
            out.append({})
    return out


def _builder_source_hash(fn) -> str:
    """v1 fingerprint component: the builder's own source + nothing else."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(fn)
        # getsource on a decorated function includes the @register(...)
        # call — whose doc= text changes for editorial reasons; hash from
        # the def line so only BEHAVIOR (body + oracle) invalidates.
        at = src.find(f"def {fn.__name__}")
        if at >= 0:
            src = src[at:]
    except (OSError, TypeError):  # builtins/partials — fall back to name
        src = getattr(fn, "__qualname__", repr(fn))
    return src


# ---------------------------------------------------------------------------
# Transitive dependency fingerprinting (VERDICT r06 ask #2): v1 hashed only
# the builder's source + oracle, so rewriting a shared engine helper
# (operators/dedup.py, functions/text.py, a limb-sum helper in this file)
# left every dependent query's driver green standing even though the
# verified behavior changed. v2 folds in the code the builder actually
# REACHES: every package-defined function/class/module/constant resolvable
# from the builder's (recursively nested) code objects, followed through
# helper chains. Function-level granularity — editing an UNRELATED function
# in the same operator file does not stale dependents; editing anything on
# the call path does.

_PKG_PREFIX = __name__.split(".")[0]  # "qa_data_pipeline_rag_llm_spark"
_MODULE_FILE_HASH_CACHE: dict[str, str] = {}
# keyed by the function OBJECT (not id(fn): ids recycle after GC and an
# aliased entry would hand one builder another builder's dep hash; the
# strong key also pins the fn alive so the id stays unique)
_DEP_HASH_CACHE: dict[object, str] = {}


def _code_names(code) -> set[str]:
    """co_names of a code object INCLUDING nested lambdas/comprehensions
    (their names live in the nested code objects' co_names, not the
    outer one's)."""
    import types

    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _code_names(const)
    return names


def _code_strings(code) -> set[str]:
    """String constants of a code object including nested code objects —
    how `REGISTRY["sibling_name"]` composition sites name their deps."""
    import types

    out = {c for c in code.co_consts if isinstance(c, str)}
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            out |= _code_strings(const)
    return out


def _code_import_from_by_mod(code) -> dict[str, set[str]]:
    """Names loaded via IMPORT_FROM (function-local ``from mod import
    x``), keyed by the module they were imported FROM — each IMPORT_FROM
    consumes the module pushed by its preceding IMPORT_NAME, so the pair
    is adjacent in the instruction stream. Including nested code objects.
    Per-module attribution (advice r08): a flat name set let ``from json
    import dumps`` getattr-probe "dumps" against EVERY local package
    module, so a module coincidentally exposing a same-named attribute
    folded a spurious dep into the hash — the same fingerprint-churn
    class the r07 fix removed for method names."""
    import dis
    import types

    out: dict[str, set[str]] = {}
    cur = None
    for ins in dis.get_instructions(code):
        if ins.opname == "IMPORT_NAME":
            cur = ins.argval
        elif ins.opname == "IMPORT_FROM" and cur is not None:
            out.setdefault(cur, set()).add(ins.argval)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            for mod, names in _code_import_from_by_mod(const).items():
                out.setdefault(mod, set()).update(names)
    return out


def _code_attr_pairs(code) -> set[tuple[str, str]]:
    """(base-name, attr-name) pairs for direct attribute access on a
    named load (``hll.estimate`` → ("hll", "estimate")), including nested
    code objects. Restricts which attr names get getattr-resolved against
    a locally imported package module: only attrs accessed ON that
    module's alias, never arbitrary method names (advice r07)."""
    import dis
    import types

    out: set[tuple[str, str]] = set()
    prev = None
    for ins in dis.get_instructions(code):
        if ins.opname in ("LOAD_ATTR", "LOAD_METHOD") and prev is not None:
            if prev.opname in (
                "LOAD_GLOBAL",
                "LOAD_NAME",
                "LOAD_FAST",
                "LOAD_DEREF",
            ):
                out.add((prev.argval, ins.argval))
        prev = ins
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            out |= _code_attr_pairs(const)
    return out


def _module_file_hash(mod) -> str:
    import hashlib
    from pathlib import Path

    name = getattr(mod, "__name__", "")
    cached = _MODULE_FILE_HASH_CACHE.get(name)
    if cached is not None:
        return cached
    path = getattr(mod, "__file__", None)
    try:
        h = hashlib.sha256(Path(path).read_bytes()).hexdigest()[:12]
    except (OSError, TypeError):
        h = "nofile"
    _MODULE_FILE_HASH_CACHE[name] = h
    return h


def _const_repr(v) -> str | None:
    """Deterministic repr for simple module-level constants (template
    strings, scales, tuples of those). None for anything whose repr could
    carry addresses or hash-seed-dependent ordering — and for bools/None,
    the typical RUNTIME-TOGGLE types (e.g. catalog._PERSIST, flipped by
    enable_table_persist mid-process): a mutable flag's value at
    fingerprint time is an accident of call order, not code identity."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (str, bytes, int, float)):
        return repr(v)
    if isinstance(v, tuple):
        parts = [_const_repr(x) for x in v]
        return None if None in parts else "(" + ",".join(parts) + ")"
    return None


def _dep_add(
    obj, name: str, visited: set, out: dict[str, str], module: str = ""
) -> bool:
    """Record one reachable object's identity into out ({qualified-name:
    hash}): package functions/classes by source (recursing into their own
    reach), package modules by file content, wrapped callables by their
    inner function, simple constants by repr. ``module`` is the module the
    lookup resolved through — functions/classes carry their own
    ``__module__``, but constants don't, so it qualifies their key
    (advice r07: two same-named constants in different modules must not
    collide into one ``const:`` entry, or an edit to the shadowed one
    keeps a stale verification valid). Returns True when the object
    produced a dep entry (or is REGISTRY, covered by the sibling scan) —
    False for foreign/opaque objects."""
    import inspect
    import types

    if obj is REGISTRY:
        return True  # composition handled by the string-literal sib scan
    if isinstance(obj, types.ModuleType):
        if getattr(obj, "__name__", "").startswith(_PKG_PREFIX):
            out[f"mod:{obj.__name__}"] = _module_file_hash(obj)
            return True
        return False
    mod = getattr(obj, "__module__", None)
    if isinstance(obj, types.FunctionType) and (mod or "").startswith(
        _PKG_PREFIX
    ):
        key = f"fn:{mod}.{obj.__qualname__}"
        if key not in out:
            try:
                out[key] = _src_hash(inspect.getsource(obj))
            except (OSError, TypeError):
                out[key] = "nosrc"
            _dep_items(obj, visited, out)
        return True
    if isinstance(obj, type) and (mod or "").startswith(_PKG_PREFIX):
        key = f"cls:{mod}.{obj.__qualname__}"
        if key not in out:
            try:
                out[key] = _src_hash(inspect.getsource(obj))
            except (OSError, TypeError):
                out[key] = "nosrc"
            for meth in vars(obj).values():
                if isinstance(meth, types.FunctionType):
                    _dep_items(meth, visited, out)
        return True
    # wrapped callables (pandas_udf objects, functools.wraps chains)
    # carry the package function inside — hash that, not the wrapper
    inner = getattr(obj, "func", None) or getattr(obj, "__wrapped__", None)
    if isinstance(inner, types.FunctionType) and (
        getattr(inner, "__module__", "") or ""
    ).startswith(_PKG_PREFIX):
        key = f"fn:{inner.__module__}.{inner.__qualname__}"
        if key not in out:
            try:
                out[key] = _src_hash(inspect.getsource(inner))
            except (OSError, TypeError):
                out[key] = "nosrc"
            _dep_items(inner, visited, out)
        return True
    if isinstance(obj, (types.BuiltinFunctionType, type)):
        return False
    r = _const_repr(obj)
    if r is not None and not callable(obj):
        # module-level constant the builder reads (e.g. a shared SQL
        # template or scale) — its VALUE is part of the behavior. Keyed
        # by qualified name and first-write-wins like the fn/cls
        # branches (advice r07).
        key = f"const:{module}.{name}" if module else f"const:{name}"
        if key not in out:
            out[key] = _src_hash(r)
        return True
    return False


_MISSING = object()


def _dep_items(fn, visited: set, out: dict[str, str]) -> None:
    """Walk fn's reachable package-defined dependencies into out."""
    import importlib

    code = getattr(fn, "__code__", None)
    gl = getattr(fn, "__globals__", None)
    if code is None or gl is None or id(code) in visited:
        return
    visited.add(id(code))
    import types

    names = sorted(_code_names(code))
    own_module = gl.get("__name__", "")
    local_mods = []
    for name in names:
        if name in gl:
            obj = gl[name]
            if isinstance(obj, types.ModuleType) and getattr(
                obj, "__name__", ""
            ).startswith(_PKG_PREFIX):
                # `from pkg.operators import hll; hll.estimate(...)` —
                # the used attr names are in co_names; resolve them at
                # function granularity below, same as local imports
                local_mods.append(obj)
            else:
                _dep_add(obj, name, visited, out, own_module)
        elif name.startswith(_PKG_PREFIX + "."):
            # function-local `from qa_...mod import x`: only the dotted
            # module path reaches co_names — resolve the imported attrs
            # at FUNCTION granularity below (a file hash here would make
            # every edit to a 1000-line plans module stale all its
            # local importers, e.g. registering one new query)
            try:
                local_mods.append(importlib.import_module(name))
            except ImportError:
                out[f"mod:{name}"] = "noimport"
    # Names attributable to a local module: IMPORT_FROM targets imported
    # from THAT module (the function-local `from mod import x` shape,
    # advice r08 — names from OTHER modules' froms must not probe it)
    # plus attributes accessed on a global alias of that exact module
    # object. NOT every unresolved co_name (advice r07): `df.filter(...)`'s
    # method name must not fold a coincidentally same-named attribute of
    # an imported package module into the dep hash, churning fingerprints
    # on unrelated edits.
    imported_by_mod = _code_import_from_by_mod(code)
    attr_pairs = _code_attr_pairs(code)
    for mod in local_mods:
        mod_name = mod.__name__
        # relative froms reach bytecode as the unprefixed tail
        candidates = set(imported_by_mod.get(mod_name, ())) | {
            n
            for m, names in imported_by_mod.items()
            if mod_name.endswith("." + m)
            for n in names
        }
        candidates |= {
            attr for base, attr in attr_pairs if gl.get(base) is mod
        }
        hits = 0
        for name in sorted(candidates):
            obj = getattr(mod, name, _MISSING)
            if obj is not _MISSING and _dep_add(
                obj, name, visited, out, mod.__name__
            ):
                hits += 1
        if hits == 0:
            # the import's targets may have been attributed through
            # module-top globals already (same object identity) — only
            # an import with NO attributable name anywhere falls back to
            # pinning the file, so exotic patterns can't escape
            hits = sum(
                1
                for name in names
                if name in gl and getattr(mod, name, _MISSING) is gl[name]
            )
        if hits == 0:
            out[f"mod:{mod.__name__}"] = _module_file_hash(mod)
    # Dynamic composition: builders that call sibling queries through
    # `REGISTRY["name"].spark(...)` name their dep as a string literal,
    # invisible to co_names. Resolve every string constant that is a
    # registry key and fold in that sibling's builder (recursively) —
    # this is how curation_decisions/leakage-audit/streaming-twin
    # composition stays fingerprint-covered.
    # (a function-local `from ...queries import REGISTRY` leaves the name
    # out of __globals__ — fall back to the canonical registry then)
    reg = gl.get("REGISTRY")
    if reg is None and "REGISTRY" in _code_names(code):
        reg = REGISTRY
    if isinstance(reg, dict) and reg is REGISTRY:
        for lit in sorted(_code_strings(code) & set(reg)):
            sib = reg[lit].spark
            if sib is fn:
                continue
            key = f"sib:{lit}"
            if key not in out:
                out[key] = _src_hash(_builder_source_hash(sib))
                _dep_items(sib, visited, out)


def _src_hash(text: str) -> str:
    import hashlib

    return hashlib.sha256(text.encode()).hexdigest()[:12]


def query_dep_hash(fn) -> str:
    """Hash of everything the builder reaches beyond its own source."""
    import hashlib

    cached = _DEP_HASH_CACHE.get(fn)
    if cached is not None:
        return cached
    deps: dict[str, str] = {}
    _dep_items(fn, set(), deps)
    blob = "\n".join(f"{k}={v}" for k, v in sorted(deps.items()))
    h = hashlib.sha256(blob.encode()).hexdigest()[:8]
    _DEP_HASH_CACHE[fn] = h
    return h


def query_fingerprint(spec: QuerySpec) -> str:
    """Identity of what the driver actually verifies: the Spark builder's
    source + the oracle text (v1 prefix), plus the transitive hash of
    every package helper/constant the builder reaches (v2 suffix,
    VERDICT r06 ask #2). A clean artifact row certifies THIS triple —
    change any part and the row is evidence about code that no longer
    exists. Ledger rounds 1-6 predate the suffix; `_fp_matches` compares
    them on the v1 prefix only (they honestly certified just that)."""
    import hashlib

    body = _builder_source_hash(spec.spark) + "\x00" + (spec.oracle or "")
    v1 = hashlib.sha256(body.encode()).hexdigest()[:16]
    return v1 + "." + query_dep_hash(spec.spark)


def _fp_matches(stored: str | None, current: str) -> bool:
    """Compare a ledger fingerprint against the working tree's. v1-format
    snapshots (rounds 1-6, no dep suffix) certified only builder+oracle,
    so they compare against the current v1 prefix; v2 snapshots compare
    in full."""
    if stored is None:
        return True
    if "." in stored:
        return stored == current
    return stored == current.split(".", 1)[0]


def _load_fingerprint_ledger() -> dict[str, dict[str, str]]:
    """FINGERPRINTS.json: {round: {query: fingerprint-at-that-round}}.
    Snapshot taken per round by tools/fingerprint_snapshot.py; absence
    degrades to the pre-r6 behavior (trust the artifact row)."""
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parents[2] / "FINGERPRINTS.json"
    try:
        return json.loads(path.read_text())
    except Exception:
        return {}


def _drop_stale_verifications(
    rounds: dict[str, int],
    ledger: dict[str, dict[str, str]],
    current_fp: dict[str, str],
) -> dict[str, int]:
    """Change-aware rotation (VERDICT r05 ask #2): a query whose
    (source, oracle) fingerprint differs from the snapshot at its last
    clean round returns to DEBT — the stale green certified different
    code. Rounds in `rounds` are 0-indexed artifact positions; ledger
    keys are 1-based round numbers. Missing snapshot/entry keeps the
    verification (graceful degradation for pre-ledger rounds)."""
    out: dict[str, int] = {}
    for name, rnd in rounds.items():
        snap = ledger.get(str(rnd + 1), {})
        if not _fp_matches(snap.get(name), current_fp.get(name, "")):
            continue  # rewritten since its clean row — back to debt
        out[name] = rnd
    return out


def _rewrite_rounds(
    ledger: dict[str, dict[str, str]], current_fp: dict[str, str]
) -> dict[str, int]:
    """name -> latest ledger round whose snapshot DISAGREES with the
    working tree (0 when every snapshot agrees). Higher = more recently
    rewritten; the stale ordering rechecks those first (VERDICT r06 ask
    #1: a query rewritten THIS round should re-row before one whose
    rewrite has already survived several rounds of local oracling)."""
    out: dict[str, int] = {}
    for rnd_str, snap in ledger.items():
        rnd = int(rnd_str)
        for name, fp_then in snap.items():
            cur = current_fp.get(name)
            if cur is not None and not _fp_matches(fp_then, cur):
                out[name] = max(out.get(name, 0), rnd)
    return out


def _verified_rounds(artifacts: list[dict]) -> dict[str, int]:
    """name -> LAST round with a CLEAN artifact row.

    Last-clean (not first-clean) makes the recheck rotation ADVANCE: a
    query rechecked clean this round moves to the back of the
    oldest-verified queue, so consecutive rounds recheck DIFFERENT
    queries (VERDICT r04 #6) instead of pinning the same ten forever.
    A FAILED row is debt, not verification (advice r03) — and a failure
    AFTER a clean row returns the query to debt, because the latest
    evidence says the answer regressed."""
    last_clean: dict[str, int] = {}
    last_failed: dict[str, int] = {}
    for rnd, art in enumerate(artifacts):
        for name, res in art.items():
            if not isinstance(res, dict):
                continue
            if (
                res.get("err") is not None
                or res.get("hash_match") is False
                or res.get("rows_match") is False
                or res.get("schema_match") is False
            ):
                last_failed[name] = rnd
            else:
                last_clean[name] = rnd
    return {
        n: r
        for n, r in last_clean.items()
        if last_failed.get(n, -1) < r
    }


def _ordered_names(
    names: list[str],
    rounds: dict[str, int],
    n_artifacts: int,
    oracled: set[str],
    stale: frozenset[str] | set[str] = frozenset(),
    rewritten: dict[str, int] | None = None,
) -> list[str]:
    """Pure ordering kernel (testable without touching REGISTRY/disk).

    `rounds` maps every name with a clean artifact row to its last clean
    round; `stale` is the subset whose fingerprint changed since that row
    (change-aware rotation, VERDICT r05 ask #2); `rewritten` maps names to
    their latest fingerprint-mismatch round (recency of rewrite). Never-
    rowed debt keeps all DEBT_SLOTS (the cumulative-coverage burn); stale
    queries take the RECHECKS window ahead of merely-old verifications —
    their green is evidence about code that no longer exists, the most
    urgent recheck — most recently rewritten first (VERDICT r06 ask #1).
    When debt underfills its slots the recheck queue extends into them,
    so the driver's 50-query prefix is always fully productive."""
    seen = set(rounds)

    def bucket(n: str) -> int:
        # pins hold their tier only while unverified — once an artifact
        # records them they rotate like everything else, freeing sample
        # slots for the next round's debt
        if n in _PINNED_FIRST and n not in seen:
            return 0
        if n in _PINNED_NEW and n not in seen:
            return 1
        if n not in seen and n in oracled:
            return 2
        if n not in seen:
            return 3
        return 4

    ordered = sorted(names, key=lambda n: (bucket(n), names.index(n)))
    if n_artifacts >= _RECHECK_FROM_ARTIFACTS:
        rewritten = rewritten or {}
        debt = [n for n in ordered if n not in seen]
        done = [n for n in ordered if n in seen]
        # stale first — most recently rewritten leading (VERDICT r06 ask
        # #1), then oldest clean row; then oldest verification (most
        # time to have rotted)
        done.sort(
            key=lambda n: (
                n not in stale,
                -rewritten.get(n, 0) if n in stale else 0,
                rounds[n],
                names.index(n),
            )
        )
        ordered = (
            debt[:DEBT_SLOTS]
            + done[:RECHECKS]
            + debt[DEBT_SLOTS:]
            + done[RECHECKS:]
        )
    return ordered


def _reorder_registry() -> None:
    artifacts = _load_artifacts()
    rounds = _verified_rounds(artifacts)
    ledger = _load_fingerprint_ledger()
    current_fp = {n: query_fingerprint(s) for n, s in REGISTRY.items()}
    kept = _drop_stale_verifications(rounds, ledger, current_fp)
    stale = frozenset(rounds) - set(kept)
    names = list(REGISTRY)
    oracled = {n for n in names if REGISTRY[n].oracle}
    ordered = _ordered_names(
        names,
        rounds,
        len(artifacts),
        oracled,
        stale,
        _rewrite_rounds(ledger, current_fp),
    )
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    for n in ordered:
        REGISTRY[n] = snapshot[n]


_reorder_registry()
