"""True TPC-H ``partsupp`` query shapes over a synthesized local twin.

The driver's testdata ships NO ``partsupp`` table, so the registry's
q2/q11/q16/q20 entries are structural substitutes deriving the supply
relation from ``lineitem`` (COVERAGE.md, TPC-H note). VERDICT r09 ask
#8: synthesize a deterministic local twin so the TRUE four-table shapes
exist as tested code. These are deliberately NOT registry queries — the
driver contract runs on driver testdata only; ``tests/
test_partsupp_shapes.py`` golden-checks each shape against DuckDB on
the generated parquet, and ``tools/scale_probe.py`` can generate the
twin at probe scale.

Scale notes per shape:
  * generation is a map-only explode over ``part`` plus one broadcast
    join against the ranked (tiny) supplier dim — no corpus shuffle;
  * q2 decorrelates the spec's correlated min-cost subquery into ONE
    window over the region-filtered join (the oracle keeps the
    correlated form, so the decorrelation itself is what gets checked);
  * q11 computes the global threshold as a broadcast re-aggregate of
    the SAME grouped frame (exchange reuse, the q11_important_parts
    pattern) instead of a second scan;
  * q16 is one anti-join + distinct-count aggregate;
  * q20 pushes the half-year-volume correlation into a single grouped
    lineitem aggregate joined back on (part, supp) — never per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.catalog import load_table

PS_PER_PART = 4


def synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp twin: ``PS_PER_PART`` suppliers per part
    chosen by TPC-H-style key arithmetic (part key + i·⌊S/4⌋ mod S over
    the supplier RANK, so any id space works), availqty/supplycost as
    exact integer formulas of the keys — bit-reproducible everywhere,
    no RNG. supplycost is DECIMAL(12,2): exact money, exact aggregates
    in both engines."""
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    n_supp = supp.count()  # bounded dim-table scalar
    step = max(n_supp // PS_PER_PART, 1)
    ranked = supp.select(
        "s_suppkey",
        (F.row_number().over(Window.orderBy("s_suppkey")) - 1).alias("_rn"),
    )
    fanout = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey")
        .select(
            "p_partkey",
            F.explode(
                F.array(*[F.lit(i) for i in range(min(PS_PER_PART, n_supp))])
            ).alias("_i"),
        )
        .select(
            "p_partkey",
            ((F.col("p_partkey") + F.col("_i") * step) % n_supp).alias("_rn"),
        )
    )
    return fanout.join(F.broadcast(ranked), "_rn").select(
        F.col("p_partkey").alias("ps_partkey"),
        F.col("s_suppkey").alias("ps_suppkey"),
        ((F.col("p_partkey") * 31 + F.col("s_suppkey") * 17) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        (
            (
                (F.col("p_partkey") * 7919 + F.col("s_suppkey") * 104729)
                % 100000
                + 100
            ).cast("decimal(12,2)")
            / 100
        )
        .cast("decimal(12,2)")
        .alias("ps_supplycost"),
    )


def _dims(spark: SparkSession, sf_dir: str):
    return (
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier in region (true four-table shape)


def q2_true(
    spark: SparkSession, sf_dir: str, ps: DataFrame, region: str = "EUROPE"
) -> DataFrame:
    """TPC-H Q2's real structure: for region-local (part, supplier)
    supply rows, keep only the rows achieving the part's MINIMUM
    supplycost within the region, top-100 by account balance. The
    spec's correlated scalar subquery decorrelates into one window
    min over the already-filtered join — no second partsupp scan."""
    part, supplier, nation, region_t = _dims(spark, sf_dir)
    joined = (
        ps.join(part.filter(F.col("p_size") % 5 == 0), ps.ps_partkey == part.p_partkey)
        .join(supplier, ps.ps_suppkey == supplier.s_suppkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region_t.filter(F.col("r_name") == region)),
            nation.n_regionkey == region_t.r_regionkey,
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("_min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            # double at the edge: pandas renders DuckDB DECIMAL as
            # float64, so the golden compare needs one numeric type
            F.col("ps_supplycost").cast("double").alias("ps_supplycost"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def q2_true_sql(region: str = "EUROPE") -> str:
    return f"""
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           CAST(ps_supplycost AS DOUBLE) AS ps_supplycost
    FROM partsupp ps, part p, supplier s, nation n, region r
    WHERE p.p_partkey = ps.ps_partkey AND s.s_suppkey = ps.ps_suppkey
      AND p.p_size % 5 = 0
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = '{region}'
      AND ps.ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM partsupp ps2, supplier s2, nation n2, region r2
        WHERE ps2.ps_partkey = p.p_partkey
          AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = '{region}')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """


# ---------------------------------------------------------------------------
# Q11 — important stock in a nation (global-threshold HAVING)


def q11_true(
    spark: SparkSession, sf_dir: str, ps: DataFrame, nation_name: str,
    fraction: float = 0.02,
) -> DataFrame:
    part, supplier, nation, _ = _dims(spark, sf_dir)
    local = (
        ps.join(supplier, ps.ps_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(nation.filter(F.col("n_name") == nation_name)),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost") * F.col("ps_availqty")
            ).alias("value")
        )
    )
    # global threshold: broadcast re-aggregate of the SAME grouped frame
    # (AQE reuses the exchange — one partsupp scan, not two)
    total = local.agg(
        (F.sum("value") * F.lit(fraction)).alias("_thr")
    )
    return (
        local.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("_thr"))
        .select("ps_partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


def q11_true_sql(nation_name: str, fraction: float = 0.02) -> str:
    return f"""
    SELECT ps_partkey,
           CAST(SUM(ps_supplycost * ps_availqty) AS DOUBLE) AS value
    FROM partsupp, supplier, nation
    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = '{nation_name}'
    GROUP BY ps_partkey
    HAVING SUM(ps_supplycost * ps_availqty) > (
      SELECT SUM(ps_supplycost * ps_availqty) * {fraction}
      FROM partsupp, supplier, nation
      WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = '{nation_name}')
    ORDER BY value DESC, ps_partkey
    """


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (anti-join + COUNT DISTINCT)


def q16_true(spark: SparkSession, sf_dir: str, ps: DataFrame) -> DataFrame:
    """Suppliers-per-(brand,type,size) excluding 'complaint' suppliers
    (stand-in predicate: negative account balance — testdata has no
    s_comment)."""
    part, supplier, _, _ = _dims(spark, sf_dir)
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(
            bad, ps.ps_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(
            part.filter(F.col("p_size").isin(1, 2, 3, 4, 5)),
            ps.ps_partkey == part.p_partkey,
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_TRUE_SQL = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp, part
    WHERE p_partkey = ps_partkey
      AND p_size IN (1, 2, 3, 4, 5)
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (half-of-shipped-volume correlation)


def q20_true(
    spark: SparkSession, sf_dir: str, ps: DataFrame, name_prefix: str = "p"
) -> DataFrame:
    """Suppliers whose available stock of prefix-matched parts exceeds
    half the volume they actually shipped of that part. The spec's
    correlated per-(part,supp) SUM over lineitem becomes ONE grouped
    aggregate joined back — lineitem is scanned once."""
    part, supplier, _, _ = _dims(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    wanted = part.filter(
        F.lower(F.col("p_name")).startswith(name_prefix)
    ).select("p_partkey")
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    eligible = (
        ps.join(
            F.broadcast(wanted), ps.ps_partkey == wanted.p_partkey, "left_semi"
        )
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            eligible, supplier.s_suppkey == eligible.ps_suppkey, "left_semi"
        )
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    )


def q20_true_sql(name_prefix: str = "p") -> str:
    return f"""
    SELECT s_name, s_suppkey
    FROM supplier
    WHERE s_suppkey IN (
      SELECT ps_suppkey FROM partsupp
      WHERE ps_partkey IN (
        SELECT p_partkey FROM part WHERE lower(p_name) LIKE '{name_prefix}%')
        AND ps_availqty > 0.5 * (
          SELECT SUM(l_quantity) FROM lineitem
          WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey))
    ORDER BY s_name, s_suppkey
    """
