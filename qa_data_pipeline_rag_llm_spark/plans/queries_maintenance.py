"""Registry entries: table-maintenance & data-health primitives.

The reference never operates a table over time — every run rebuilds its
CSVs and the Qdrant collection from scratch (PLATFORM-contextual-
Chunking.py:132-176 drops/recreates the collection; each Spark stage
overwrites its output object, e.g. REDDIT-Nettoyage-Comms.py:113).
A 100 TB corpus cannot be rebuilt per run; it is *maintained*. This
module adds the four primitives that maintenance needs, each oracled:

  * ``compaction_plan_orders`` — the OPTIMIZE planner: bin-pack
    partition-level file stats into target-size rewrite groups. The
    planning input is metadata (one row per partition), so the plan
    itself costs a metadata-sized shuffle no matter how big the table.
  * ``psi_drift_events`` — population-stability-index drift audit
    between two time slices of a stream: one fact scan, one groupBy,
    broadcast 1-row totals (the q11 re-aggregate pattern), ln-only
    math for cross-engine bit-stability.
  * ``cdc_versioned_merge_orders`` — changelog apply (MERGE)
    beyond ``cdc_apply_orders``/``snapshot_merge_orders``: out-of-order
    upserts resolved by (version, arrival) and hard deletes, one key
    shuffle; summarized with exact scaled-integer money sums.
  * ``heavy_hitters_events`` — mergeable Misra-Gries candidates
    (operators/freq.py) audited against exact counts: the output is
    the algorithm's GUARANTEE verdicts, which are partition-invariant
    and therefore oracle-checkable even though raw estimates are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.operators.freq import (
    misra_gries_summaries,
)
from qa_data_pipeline_rag_llm_spark.plans.queries import (
    _money,
    _t,
    o_money,
    register,
)

#: compaction target: bytes of estimated row payload per rewrite group
TARGET_BYTES = 64 * 1024

#: Misra-Gries summary capacity; heavy = true count > N/(K+1)
MG_K = 16


# ---------------------------------------------------------------------------
# 1. Small-file compaction planner (OPTIMIZE)
# ---------------------------------------------------------------------------


@register(
    "compaction_plan_orders",
    f"""
    WITH parts AS (
      SELECT (epoch_us(o_orderdate) // 86400000000) // 30 AS month_no,
             COUNT(*) AS n_rows,
             CAST(SUM(32 + length(o_orderpriority)
                      + length(o_orderstatus)) AS BIGINT) AS bytes_est
      FROM orders GROUP BY 1),
    binned AS (
      SELECT month_no, n_rows, bytes_est,
             CAST(COALESCE(SUM(bytes_est) OVER (ORDER BY month_no
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) // {TARGET_BYTES} AS bin_id
      FROM parts)
    SELECT bin_id, COUNT(*) AS n_parts,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(bytes_est) AS BIGINT) AS bin_bytes,
           MIN(month_no) AS from_month, MAX(month_no) AS to_month
    FROM binned GROUP BY bin_id
    """,
    doc="OPTIMIZE planner: per-partition (30-day bucket) row/byte stats, "
    "greedy bin-packing into ~64 KiB rewrite groups via an exclusive "
    "prefix sum over the ORDERED partition list. The global window runs "
    "on the post-aggregate stats frame — one row per table partition "
    "(metadata-sized even at 100 TB: 10^5 rows for a daily-partitioned "
    "decade), never on the fact table. Integer byte math end-to-end.",
)
def compaction_plan_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    parts = o.groupBy(
        F.expr("(unix_micros(o_orderdate) div 86400000000) div 30").alias(
            "month_no"
        )
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum(
            F.lit(32)
            + F.length("o_orderpriority")
            + F.length("o_orderstatus")
        ).alias("bytes_est"),
    )
    # bounded global window: one row per table partition (~80 here);
    # planning metadata, not data — see module docstring. SQL-expr form
    # keeps exact integer `div` semantics on the prefix sum.
    binned = parts.withColumn(
        "bin_id",
        F.expr(
            f"coalesce(sum(bytes_est) over (order by month_no "
            f"rows between unbounded preceding and 1 preceding), 0) "
            f"div {TARGET_BYTES}"
        ),
    )
    return binned.groupBy("bin_id").agg(
        F.count("*").alias("n_parts"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("bytes_est").alias("bin_bytes"),
        F.min("month_no").alias("from_month"),
        F.max("month_no").alias("to_month"),
    )


# ---------------------------------------------------------------------------
# 2. Distribution-drift audit (PSI)
# ---------------------------------------------------------------------------


@register(
    "psi_drift_events",
    """
    WITH binned AS (
      SELECT least(9, CAST(floor(value / 50.0) AS BIGINT)) AS bin,
             CAST(SUM(CASE WHEN (epoch_us(ts) // 86400000000) % 30 < 15
                 THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
             CAST(SUM(CASE WHEN (epoch_us(ts) // 86400000000) % 30 < 15
                 THEN 0 ELSE 1 END) AS BIGINT) AS cur_n
      FROM events GROUP BY 1),
    tot AS (SELECT CAST(SUM(ref_n) AS BIGINT) AS ref_t,
                CAST(SUM(cur_n) AS BIGINT) AS cur_t FROM binned)
    SELECT bin, ref_n, cur_n,
           round((CAST(ref_n + 1 AS DOUBLE) / CAST(ref_t + 10 AS DOUBLE)
                  - CAST(cur_n + 1 AS DOUBLE) / CAST(cur_t + 10 AS DOUBLE))
                 * ln((CAST(ref_n + 1 AS DOUBLE) / CAST(ref_t + 10 AS DOUBLE))
                      / (CAST(cur_n + 1 AS DOUBLE)
                         / CAST(cur_t + 10 AS DOUBLE))), 9) AS psi_term
    FROM binned, tot
    """,
    doc="Population-stability-index drift audit: value distribution of "
    "the first half of each 30-day cycle vs the second, 10 fixed bins, "
    "add-one smoothing so empty bins stay finite. One fact scan, one "
    "10-row groupBy; the side totals are a re-aggregate of the SAME "
    "grouped frame broadcast back via crossJoin (q11 pattern — the "
    "pre-shuffle subtree dedupes via exchange reuse, no second scan, "
    "no single-task window). ln-only math: both engines' ln is "
    "bit-stable on identical doubles (r3-probed contract).",
)
def psi_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    is_ref = (
        F.expr("(unix_micros(ts) div 86400000000) % 30") < 15
    ).cast("long")
    binned = ev.groupBy(
        F.least(F.lit(9).cast("long"), F.floor(F.col("value") / 50.0)).alias(
            "bin"
        )
    ).agg(
        F.sum(is_ref).alias("ref_n"),
        F.sum(F.lit(1) - is_ref).alias("cur_n"),
    )
    tot = binned.agg(
        F.sum("ref_n").alias("ref_t"), F.sum("cur_n").alias("cur_t")
    )
    p = (F.col("ref_n") + 1).cast("double") / (
        F.col("ref_t") + 10
    ).cast("double")
    q = (F.col("cur_n") + 1).cast("double") / (
        F.col("cur_t") + 10
    ).cast("double")
    return binned.crossJoin(F.broadcast(tot)).select(
        "bin",
        "ref_n",
        "cur_n",
        F.round((p - q) * F.log(p / q), 9).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# 3. CDC changelog apply (MERGE with deletes + out-of-order versions)
# ---------------------------------------------------------------------------

_CDC_ORACLE = f"""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             0 AS version, 0 AS seq, 'I' AS op
      FROM orders WHERE o_orderkey % 3 <> 0),
    c1 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice + 10.0 AS o_totalprice,
             1 + o_orderkey % 3 AS version, 1 AS seq,
             CASE WHEN o_orderkey % 5 = 0 THEN 'D' ELSE 'U' END AS op
      FROM orders WHERE o_orderkey % 2 = 0),
    c2 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice + 999.0 AS o_totalprice,
             1 AS version, 2 AS seq, 'U' AS op
      FROM orders WHERE o_orderkey % 7 = 0),
    log AS (SELECT * FROM base UNION ALL SELECT * FROM c1
            UNION ALL SELECT * FROM c2),
    latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                ORDER BY version DESC, seq DESC) AS rn
      FROM log)
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN version > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_updated,
           {o_money("o_totalprice")} AS total_price
    FROM latest WHERE rn = 1 AND op <> 'D'
    GROUP BY o_orderstatus
"""


@register(
    "cdc_versioned_merge_orders",
    _CDC_ORACLE,
    doc="CDC MERGE semantics: a base snapshot plus two changelog waves "
    "with colliding keys — latest (version, arrival-seq) wins, 'D' ops "
    "hard-delete, and the low-version late arrival (c2) must LOSE to "
    "the higher version it races (out-of-order apply). One row_number "
    "shuffle over the unioned log keyed by o_orderkey — the exact plan "
    "a 100 TB MERGE runs (changelog is synthesized from the fact table "
    "here; in production it is the small side). Verified via per-status "
    "rollup with exact scaled-integer money sums, so any mis-merged row "
    "shifts a sum.",
)
def cdc_versioned_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit(0).alias("version"),
        F.lit(0).alias("seq"),
        F.lit("I").alias("op"),
    )
    c1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 10.0).alias("o_totalprice"),
        (1 + F.col("o_orderkey") % 3).cast("int").alias("version"),
        F.lit(1).alias("seq"),
        F.when(F.col("o_orderkey") % 5 == 0, "D")
        .otherwise("U")
        .alias("op"),
    )
    c2 = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 999.0).alias("o_totalprice"),
        F.lit(1).alias("version"),
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
    )
    log = base.unionByName(c1).unionByName(c2)
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("version").desc(), F.col("seq").desc()
    )
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
    )
    return latest.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum((F.col("version") > 0).cast("long")).alias("n_updated"),
        _money("o_totalprice").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# 4. Heavy hitters: mergeable Misra-Gries with guarantee-verdict output
# ---------------------------------------------------------------------------

_HH_KEY = (
    "CASE WHEN user_id % 4 = 0 THEN 'hot' "
    "ELSE 'u' || CAST(user_id AS VARCHAR) END"
)


@register(
    "heavy_hitters_events",
    f"""
    WITH keyed AS (SELECT {_HH_KEY} AS key FROM events),
    tot AS (SELECT COUNT(*) AS n FROM keyed)
    SELECT key, COUNT(*) AS exact_n,
           TRUE AS detected, TRUE AS within_bound
    FROM keyed, tot
    GROUP BY key, tot.n
    HAVING COUNT(*) * {MG_K + 1} > tot.n
    """,
    doc="Distributed heavy hitters: per-partition Misra-Gries summaries "
    "(operators/freq.py — O(k) memory, vectorized value_counts merge, "
    "zero shuffle) merged by a metadata-sized groupBy. Output is the "
    "mergeable-summaries GUARANTEE audit, which is partition-invariant "
    "and hence cross-engine checkable: every key with true count > "
    "N/(k+1) must be detected, with est <= true <= est + D (D = total "
    "decrement offset <= N/(k+1)). A skewed key layout ('hot' = 25% of "
    "traffic vs per-user long tail) exercises the detection threshold "
    "at every scale factor. The exact groupBy here is the AUDIT arm; "
    "production emits only the O(partitions * k) candidate rows.",
)
def heavy_hitters_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    keyed = ev.select(
        F.when(F.col("user_id") % 4 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("u"), F.col("user_id").cast("string")))
        .alias("key")
    )
    mg = misra_gries_summaries(keyed, "key", MG_K)
    cand = (
        mg.filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("est").alias("est"))
    )
    dec = mg.agg(F.sum("dec").alias("dec_total"))
    exact = keyed.groupBy("key").agg(F.count("*").alias("exact_n"))
    total = exact.agg(F.sum("exact_n").alias("n_total"))
    heavy = exact.crossJoin(F.broadcast(total)).filter(
        F.col("exact_n") * (MG_K + 1) > F.col("n_total")
    )
    return (
        heavy.join(cand, "key", "left")
        .crossJoin(F.broadcast(dec))
        .select(
            "key",
            "exact_n",
            F.col("est").isNotNull().alias("detected"),
            (
                F.col("est").isNotNull()
                & (F.col("est") <= F.col("exact_n"))
                & (F.col("exact_n") - F.col("est") <= F.col("dec_total"))
            ).alias("within_bound"),
        )
    )


# ---------------------------------------------------------------- CBO stats
# ANALYZE-style join-key statistics: the numbers a cost-based optimizer
# (or a human planning a 100 TB join) needs per key column. Thresholds
# mirror Spark's autoBroadcastJoinThreshold (10 MB) with a 32-byte/row
# working estimate; skew > 4x uniform suggests salting.
_CBO_KEYS = [
    ("customer", "c_custkey"),
    ("orders", "o_custkey"),
    ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"),
]
_CBO_ROW_BYTES = 32
_CBO_BROADCAST_BYTES = 10 * 1024 * 1024
_CBO_SKEW = 4.0


def _cbo_duck_one(table: str, col: str) -> str:
    from qa_data_pipeline_rag_llm_spark.operators import hll

    return f"""
    SELECT '{table}.{col}' AS table_col, f.n_rows, f.ndv_exact,
           round(e.est, 4) AS ndv_est,
           round(100.0 * (e.est - f.ndv_exact) / f.ndv_exact, 4)
             AS ndv_err_pct,
           f.top_freq,
           round(CAST(f.top_freq AS DOUBLE) * f.ndv_exact / f.n_rows, 4)
             AS skew_ratio,
           CASE WHEN f.n_rows * {_CBO_ROW_BYTES} <= {_CBO_BROADCAST_BYTES}
                THEN 'broadcast'
                WHEN CAST(f.top_freq AS DOUBLE) * f.ndv_exact / f.n_rows
                     > {_CBO_SKEW}
                THEN 'salted_shuffle'
                ELSE 'shuffle' END AS strategy
    FROM (
      SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS ndv_exact,
             CAST(MAX(n) AS BIGINT) AS top_freq
      FROM (SELECT {col} AS k, COUNT(*) AS n FROM {table}
            WHERE {col} IS NOT NULL GROUP BY {col})) f,
    ({hll.duck_estimate_sql(
        f'''(SELECT 1 AS g, {hll.duck_bucket_sql(col)} AS bucket,
                    MAX({hll.duck_rho_sql(col)}) AS m_reg
             FROM {table} WHERE {col} IS NOT NULL
             GROUP BY {hll.duck_bucket_sql(col)})''', "g")}) e
    """


def _cbo_spark_one(spark, sf_dir: str, table: str, col: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.operators import hll

    k = (
        _t(spark, sf_dir, table)
        .where(F.col(col).isNotNull())
        .select(F.col(col).alias("k"))
    )
    freq = k.groupBy("k").agg(F.count("*").alias("n"))
    f = freq.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("ndv_exact"),
        F.max("n").cast("long").alias("top_freq"),
    )
    regs = (
        k.select(*hll.register_cols("k"))
        .groupBy("bucket")
        .agg(F.max("r").alias("m_reg"))
        .select(F.lit(1).alias("g"), "bucket", "m_reg")
    )
    est = hll.estimate(regs, ["g"])
    skew = (
        F.col("top_freq").cast("double")
        * F.col("ndv_exact")
        / F.col("n_rows")
    )
    return f.crossJoin(F.broadcast(est)).select(
        F.lit(f"{table}.{col}").alias("table_col"),
        "n_rows",
        "ndv_exact",
        F.round(F.col("est"), 4).alias("ndv_est"),
        F.round(
            F.lit(100.0)
            * (F.col("est") - F.col("ndv_exact"))
            / F.col("ndv_exact"),
            4,
        ).alias("ndv_err_pct"),
        "top_freq",
        F.round(skew, 4).alias("skew_ratio"),
        F.when(
            F.col("n_rows") * _CBO_ROW_BYTES <= _CBO_BROADCAST_BYTES,
            F.lit("broadcast"),
        )
        .when(skew > _CBO_SKEW, F.lit("salted_shuffle"))
        .otherwise(F.lit("shuffle"))
        .alias("strategy"),
    )


@register(
    "cbo_stats_join_keys",
    " UNION ALL ".join(_cbo_duck_one(t, c) for t, c in _CBO_KEYS),
    doc="ANALYZE TABLE twin: per join-key column, the statistics a "
    "cost-based optimizer plans joins from — row count, exact NDV "
    "(audit), deterministic-HLL NDV estimate (operators/hll.py — what "
    "Spark's own ANALYZE computes, made cross-engine-checkable), top "
    "key frequency, skew ratio (top_freq x ndv / rows; 1.0 = uniform), "
    "and the derived join-strategy verdict mirroring the "
    "autoBroadcastJoinThreshold + salt-above-4x-skew rules the "
    "engine's own queries follow (q5 broadcasts dims, salted_join "
    "salts). Per column: one keyed partial-count shuffle + one "
    "register shuffle, both map-side combinable; at 100 TB the HLL "
    "path IS the product (exact NDV rides as audit) and the stats "
    "table is what you persist to drive broadcast/salt decisions "
    "without rescanning. Reference contrast: no statistics surface "
    "exists (the reference hard-codes its join order, main-spark.py).",
)
def cbo_stats_join_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t, c in _CBO_KEYS:
        one = _cbo_spark_one(spark, sf_dir, t, c)
        out = one if out is None else out.unionByName(one)
    return out
