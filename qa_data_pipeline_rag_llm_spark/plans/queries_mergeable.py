"""Registry entries: mergeable-summary algebra — the property that makes
100 TB aggregation embarrassingly parallel.

The reference has no sketch/cardinality surface at all — its only
driver-side aggregation is exact pandas over a collected frame
(`PLATFORM-contextual-Chunking.py:97`'s groupby→to_dict,
`app2.py:59-63`'s concat+isin); at corpus scale those become mergeable
summaries:
each partition emits a tiny state, states merge associatively, and the
final answer never touches raw rows again. Spark's built-ins
(`approx_count_distinct`, `hll_sketch_agg`, `sampleBy`) implement this
but are implementation-defined, so they can never value-hash-match a
DuckDB oracle (the `sketch_stats_events` lesson). This family instead
implements the SAME algebra deterministically from md5 — every register
and every reservoir key is a pure function of the data, replayed
bit-identically by the oracle (core algebra in ``operators/hll.py``):

* ``hll_union_users_events`` — from-scratch HyperLogLog (p=8, m=256,
  Flajolet et al. 2007 estimator + linear-counting branch) per
  event_type, plus the union proof: per-type register vectors
  max-merged into an ``ALL`` scope that estimates distinct users across
  all types WITHOUT rescanning.
* ``streaming_hll_users`` — the streaming twin: register maintenance as
  a stateful aggregation whose state IS the sketch (256 longs, merged
  by max across micro-batches exactly as partitions merge in batch);
  complete-mode AvailableNow replay makes the result a total function
  of the input, so the oracle checks the STREAMING path exactly.
* ``weighted_reservoir_documents`` — weighted sampling without
  replacement (Efraimidis–Spirakis A-ExpJ): key = ln(u)/weight with u a
  deterministic md5-derived uniform, top-k keys per source. Top-k of a
  union = merge of per-partition top-k's, so the reservoir is itself a
  mergeable summary; the ranking runs on the salted two-phase operator
  (few sources — the one-task-per-group window is the r02 scale
  killer).

Exactness discipline: all register terms 2^(-M_j) are dyadic rationals
summed as scaled integers (term = 1 << (61 - M_j), one DECIMAL(38,0)
sum, one closing division); ln/exp only where the established ln-exp
cross-engine discipline already applies (queries_contrib.py), never
log2/pow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.operators import hll
from qa_data_pipeline_rag_llm_spark.operators.ranking import salted_top_k
from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register

# Re-exports pinned by tests/test_mergeable.py's parity suite.
_M = hll.M
_RHO_MAX = hll.RHO_MAX
_SPARK_BUCKET = hll.spark_bucket_sql("user_id")
_SPARK_W = hll.spark_w_sql("user_id")
_DUCK_BUCKET = hll.duck_bucket_sql("user_id")
_DUCK_W = hll.duck_w_sql("user_id")

# Final projection shared by both HLL queries (engine + oracle shape).
# {j} carries extra join conjuncts (e.g. the is_union disambiguator —
# ADVICE r05: a REAL event_type named 'ALL' must not cross-match the
# union scope's rows; label collision is fine, join fan-out is not).
_HLL_FINAL_DUCK = """
    SELECT e.{g} AS scope, x.exact_users, e.v AS empty_registers,
           round(e.est, 4) AS est_users,
           round(100.0 * (e.est - x.exact_users) / x.exact_users, 4)
             AS err_pct,
           (abs(e.est - x.exact_users) / x.exact_users <= 0.195)
             AS within_budget
    FROM est e JOIN ex x ON e.{g} = x.{g}{j}
"""


def _hll_final(
    est: DataFrame,
    ex: DataFrame,
    group_col: str,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    e = F.col("est")
    return est.join(ex, [group_col, *(extra_keys or [])]).select(
        F.col(group_col).alias("scope"),
        "exact_users",
        F.col("v").alias("empty_registers"),
        F.round(e, 4).alias("est_users"),
        F.round(
            F.lit(100.0) * (e - F.col("exact_users")) / F.col("exact_users"),
            4,
        ).alias("err_pct"),
        (
            F.abs(e - F.col("exact_users")) / F.col("exact_users")
            <= F.lit(0.195)
        ).alias("within_budget"),
    )


@register(
    "hll_union_users_events",
    f"""
    WITH raw AS (
      SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL),
    rho AS (
      SELECT event_type, {hll.duck_bucket_sql("user_id")} AS bucket,
             {hll.duck_rho_sql("user_id")} AS r
      FROM raw),
    regs AS (
      SELECT event_type, bucket, MAX(r) AS m_reg
      FROM rho GROUP BY event_type, bucket),
    mregs AS (
      SELECT 'ALL' AS event_type, bucket, MAX(m_reg) AS m_reg
      FROM regs GROUP BY bucket),
    est AS (
      SELECT *, FALSE AS is_union FROM ({hll.duck_estimate_sql("regs", "event_type")})
      UNION ALL
      SELECT *, TRUE AS is_union FROM ({hll.duck_estimate_sql("mregs", "event_type")})),
    ex AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
             FALSE AS is_union
      FROM raw GROUP BY event_type
      UNION ALL
      SELECT 'ALL' AS event_type, COUNT(DISTINCT user_id), TRUE AS is_union
      FROM raw)
    {_HLL_FINAL_DUCK.format(g="event_type", j=" AND e.is_union = x.is_union")}
    """,
    doc="From-scratch deterministic HyperLogLog (p=8, m=256; Flajolet "
    "et al. 2007 raw estimator + linear-counting small-range branch) "
    "over events.user_id per event_type, PLUS the union-merge proof: "
    "the 'ALL' scope max-merges the per-type register vectors and "
    "estimates distinct users across all types without rescanning — "
    "the associative-merge property that makes sketch aggregation "
    "embarrassingly parallel at 100 TB (registers merge across "
    "partitions/days/DCs; raw rows never move twice). Register "
    "extraction is a map-side-combinable groupBy(type, bucket).max — "
    "the only data-sized shuffle besides the exact-reference "
    "count-distinct audit columns. All 2^-M_j terms are dyadic "
    "rationals summed as scaled integers (1 << (61-M_j), DECIMAL "
    "accumulate, one closing division); md5-register parity is pinned "
    "cross-engine. Reference contrast: no distinct-count surface "
    "exists; its nearest aggregation is driver-side pandas "
    "groupby->to_dict (PLATFORM-contextual-Chunking.py:97) — "
    "single-node only.",
)
def hll_union_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    rho = ev.select("event_type", *hll.register_cols("user_id"))
    regs = rho.groupBy("event_type", "bucket").agg(F.max("r").alias("m_reg"))
    # the union scope estimates from its OWN aggregate (never unioned
    # into the per-type register frame): a real event_type named 'ALL'
    # can then only collide on the output label, not corrupt the
    # register math (review r05 — v would go negative on a shared
    # groupBy)
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("m_reg").alias("m_reg"))
        .select(F.lit("ALL").alias("event_type"), "bucket", "m_reg")
    )
    est = (
        hll.estimate(regs, ["event_type"])
        .withColumn("is_union", F.lit(False))
        .unionByName(
            hll.estimate(merged, ["event_type"]).withColumn(
                "is_union", F.lit(True)
            )
        )
    )
    ex = (
        ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_users"))
        .withColumn("is_union", F.lit(False))
        .unionByName(
            ev.agg(F.count_distinct("user_id").alias("exact_users")).select(
                F.lit("ALL").alias("event_type"),
                "exact_users",
                F.lit(True).alias("is_union"),
            )
        )
    )
    # join keyed on (event_type, is_union): a real event_type 'ALL' may
    # share the output label with the union scope but can never
    # cross-match its est/ex rows (ADVICE r05)
    return _hll_final(est, ex, "event_type", extra_keys=["is_union"])


@register(
    "streaming_hll_users",
    f"""
    WITH raw AS (
      SELECT user_id FROM events WHERE user_id IS NOT NULL),
    rho AS (
      SELECT {hll.duck_bucket_sql("user_id")} AS bucket,
             {hll.duck_rho_sql("user_id")} AS r
      FROM raw),
    regs AS (
      SELECT 'stream' AS scope, bucket, MAX(r) AS m_reg
      FROM rho GROUP BY bucket),
    est AS ({hll.duck_estimate_sql("regs", "scope")}),
    ex AS (
      SELECT 'stream' AS scope, COUNT(DISTINCT user_id) AS exact_users
      FROM raw)
    {_HLL_FINAL_DUCK.format(g="scope", j="")}
    """,
    doc="Streaming twin of hll_union_users_events: the register vector "
    "maintained as streaming state. The stateful complete-mode "
    "groupBy(bucket).max(rho) keeps exactly 256 longs in the state "
    "store — the sketch IS the state, and each micro-batch's partial "
    "registers merge by max exactly as batch partitions do, so a "
    "dashboard reads live distinct-user estimates without any "
    "count-distinct re-aggregation. AvailableNow + complete mode makes "
    "the replay a total function of the input files (the "
    "streaming_scd2 batch-parity discipline), so the oracle verifies "
    "the streaming path exactly; the exact-reference audit column "
    "comes from the batch table. At 100 TB/day the state never grows: "
    "cardinality tracking costs m=256 longs per tracked scope.",
)
def streaming_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        read_events_stream,
        run_to_completion,
        state_partitions_for_input,
    )

    ev = read_events_stream(spark, sf_dir).where(F.col("user_id").isNotNull())
    regs_stream = (
        ev.select(*hll.register_cols("user_id"))
        .groupBy("bucket")
        .agg(F.max("r").alias("m_reg"))
    )
    regs = run_to_completion(
        regs_stream,
        "complete",
        state_partitions_for_input(spark, sf_dir, tables=("events",)),
    ).select(
        F.lit("stream").alias("scope"), "bucket", "m_reg"
    )
    est = hll.estimate(regs, ["scope"])
    ex = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .agg(F.count_distinct("user_id").alias("exact_users"))
        .select(F.lit("stream").alias("scope"), "exact_users")
    )
    return _hll_final(est, F.broadcast(ex), "scope")


# A-ExpJ uniform: md5 hex chars 3-17 -> 60-bit integer; u = (w+1)/2^60
# in (0, 1], exact dyadic on both engines. key = ln(u)/weight, larger =
# kept (Efraimidis & Spirakis 2006, order-equivalent to u^(1/w)).
_TWO60 = 1 << 60
_RES_K = 20


@register(
    "weighted_reservoir_documents",
    f"""
    SELECT source, rank, doc_id, n_chars AS weight
    FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ln(CAST({hll.duck_w_sql("doc_id")}
                            + 1 AS DOUBLE)
                           / CAST({_TWO60} AS DOUBLE)) / n_chars DESC,
                        doc_id) AS rank
      FROM documents WHERE n_chars > 0)
    WHERE rank <= {_RES_K}
    """,
    doc="Weighted sampling without replacement (Efraimidis–Spirakis "
    "A-ExpJ): per-source top-20 documents by key ln(u)/n_chars where u "
    "is a deterministic md5-derived uniform in (0,1] — selection "
    "probability proportional to size, reproducible across engines "
    "(RNG-free, the quota_sample discipline). The reservoir is itself "
    "a mergeable summary — top-k of a union equals the merge of "
    "per-partition top-k's — so at 100 TB each executor keeps a local "
    "heap and only k·partitions candidate rows ever shuffle; here the "
    "ranking runs on the salted two-phase top-k operator because "
    "sources are few (one-task-per-group window is the r02 scale "
    "killer). u = (w+1)/2^60 is exact dyadic; ln sits inside the "
    "established ln/exp cross-engine discipline (queries_contrib.py). "
    "Reference contrast: no sampling surface exists; the nearest "
    "shape is the driver-side head-n similar-posts truncation "
    "(PLATFORM-contextual-Chunking.py:98-109, similaires[:20]).",
)
def weighted_reservoir_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u_num = F.expr(hll.spark_w_sql("doc_id")) + 1
    key = F.log(u_num.cast("double") / F.lit(float(_TWO60))) / F.col(
        "n_chars"
    )
    ranked = salted_top_k(
        docs.withColumn("__res_key", key),
        ["source"],
        [F.col("__res_key").desc(), F.col("doc_id")],
        _RES_K,
        salt_col="doc_id",
        rank_col="rank",
    )
    return ranked.select(
        "source", "rank", "doc_id", F.col("n_chars").alias("weight")
    )


_ROLL_DAYS = 7


@register(
    "hll_rollup_daily_users",
    f"""
    WITH raw AS (
      SELECT date_trunc('day', ts) AS day, user_id
      FROM events WHERE user_id IS NOT NULL),
    rho AS (
      SELECT day, {hll.duck_bucket_sql("user_id")} AS bucket,
             {hll.duck_rho_sql("user_id")} AS r
      FROM raw),
    regs AS (
      SELECT day, bucket, MAX(r) AS m_reg FROM rho GROUP BY day, bucket),
    days AS (SELECT DISTINCT day FROM regs),
    pairs AS (
      SELECT d.day, d.day - o.off * INTERVAL '1 day' AS src_day
      FROM days d
      CROSS JOIN (SELECT CAST(range AS INTEGER) AS off
                  FROM range({_ROLL_DAYS})) o),
    winregs AS (
      SELECT p.day, r.bucket, MAX(r.m_reg) AS m_reg
      FROM pairs p JOIN regs r ON r.day = p.src_day
      GROUP BY p.day, r.bucket),
    est AS ({hll.duck_estimate_sql("winregs", "day")}),
    du AS (SELECT DISTINCT day AS src_day, user_id FROM raw),
    ex AS (
      SELECT p.day, COUNT(DISTINCT d.user_id) AS exact_users
      FROM pairs p JOIN du d ON d.src_day = p.src_day GROUP BY p.day)
    SELECT strftime(e.day, '%Y-%m-%d') AS day, x.exact_users,
           e.v AS empty_registers, round(e.est, 4) AS est_users,
           round(100.0 * (e.est - x.exact_users) / x.exact_users, 4)
             AS err_pct,
           (abs(e.est - x.exact_users) / x.exact_users <= 0.195)
             AS within_budget
    FROM est e JOIN ex x ON e.day = x.day
    """,
    doc="Sketch rollup over time (the hypertable-rollup pattern): daily "
    "HLL register vectors — the compact state a lakehouse would "
    "materialize per partition — max-merged over a trailing 7-day "
    "window to answer 'distinct users in the last week' for EVERY day "
    "without ever re-scanning raw events. The raw scan happens once "
    "(register extraction, map-side combinable); the rolling merge "
    "joins days·7 spine rows against days·<=256 register rows — state "
    "whose size depends on the calendar, not the corpus. At 100 TB "
    "this is the nightly-rollup pattern: store (day, bucket, m_reg), "
    "answer any trailing-window cardinality from state; windows "
    "compose by the same max-merge across arbitrary spans. Exact "
    "trailing-window count-distinct rides along as the audit (the "
    "expensive path the sketch replaces). Completes the family's "
    "sketch lifecycle: extract (hll_union) -> stream (streaming_hll) "
    "-> store+serve (this).",
)
def hll_rollup_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    raw = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    )
    rho = raw.select("day", *hll.register_cols("user_id"))
    regs = rho.groupBy("day", "bucket").agg(F.max("r").alias("m_reg"))
    offs = spark.range(_ROLL_DAYS).select(
        F.col("id").cast("int").alias("off")
    )
    pairs = (
        regs.select("day")
        .distinct()
        .crossJoin(F.broadcast(offs))
        .select("day", F.date_sub(F.col("day"), F.col("off")).alias("src_day"))
    )
    winregs = (
        pairs.join(
            regs.withColumnRenamed("day", "src_day"), "src_day"
        )
        .groupBy("day", "bucket")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    est = hll.estimate(winregs, ["day"])
    du = raw.select(F.col("day").alias("src_day"), "user_id").distinct()
    ex = (
        pairs.join(du, "src_day")
        .select("day", "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("exact_users"))
    )
    out = _hll_final(est, ex, "day")
    return out.withColumn("scope", F.date_format("scope", "yyyy-MM-dd")).withColumnRenamed(
        "scope", "day"
    )


@register(
    "hll_vocab_overlap_by_source",
    f"""
    WITH toks AS (
      SELECT source, unnest(string_split(coalesce(text, ''), ' ')) AS w
      FROM documents),
    tok AS (SELECT source, w FROM toks WHERE w <> ''),
    sparse AS (
      SELECT source, {hll.duck_bucket_sql("w")} AS bucket,
             MAX({hll.duck_rho_sql("w")}) AS m_reg
      FROM tok GROUP BY source, {hll.duck_bucket_sql("w")}),
    dense AS (
      SELECT s.source, b.bucket, coalesce(r.m_reg, 0) AS m_reg
      FROM (SELECT DISTINCT source FROM sparse) s
      CROSS JOIN (SELECT CAST(range AS INTEGER) AS bucket
                  FROM range({hll.M})) b
      LEFT JOIN sparse r ON r.source = s.source AND r.bucket = b.bucket),
    per_src AS ({hll.duck_estimate_dense_sql("dense", "source")}),
    pair_regs AS (
      SELECT a.source AS src_a, b.source AS src_b, a.bucket,
             greatest(a.m_reg, b.m_reg) AS m_reg
      FROM dense a JOIN dense b
        ON a.bucket = b.bucket AND a.source < b.source),
    pair_est AS ({hll.duck_estimate_dense_sql("pair_regs",
                                              "src_a, src_b")}),
    vocab AS (SELECT DISTINCT source, w FROM tok),
    sizes AS (SELECT source, COUNT(*) AS nv FROM vocab GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT p.src_a, p.src_b,
           (sa.nv + sb.nv - coalesce(i.n_common, 0)) AS exact_union,
           round(p.est, 4) AS est_union,
           coalesce(i.n_common, 0) AS exact_inter,
           round(ea.est + eb.est - p.est, 4) AS est_inter,
           round(100.0 * (p.est - (sa.nv + sb.nv - coalesce(i.n_common, 0)))
                 / (sa.nv + sb.nv - coalesce(i.n_common, 0)), 4)
             AS union_err_pct,
           (abs(p.est - (sa.nv + sb.nv - coalesce(i.n_common, 0)))
            / (sa.nv + sb.nv - coalesce(i.n_common, 0)) <= 0.195)
             AS union_within_budget
    FROM pair_est p
    JOIN per_src ea ON ea.source = p.src_a
    JOIN per_src eb ON eb.source = p.src_b
    JOIN sizes sa ON sa.source = p.src_a
    JOIN sizes sb ON sb.source = p.src_b
    LEFT JOIN inter i ON i.src_a = p.src_a AND i.src_b = p.src_b
    """,
    doc="Sketch-space set algebra: pairwise source-vocabulary union and "
    "intersection estimated from per-source HLL register vectors alone "
    "— union by register max-merge, intersection by inclusion-"
    "exclusion (est_a + est_b - est_union). This is the 100 TB twin of "
    "source_vocab_overlap (queries_diff_mining.py): the exact form "
    "self-joins vocabulary-sized sets per pair, the sketch form joins "
    "S dense 256-long vectors — pair cost drops from O(|V_a ∩ V_b|) "
    "to O(m), so an S-source overlap matrix needs S·m longs of state "
    "regardless of corpus size. Same space-split tokenization as the "
    "exact query; exact union/intersection ride along as audit "
    "columns (test-scale verification — the verdict gates the union, "
    "which carries the HLL error guarantee; inclusion-exclusion "
    "intersections are reported, their error compounds by design). "
    "Dense vectors come from a broadcast 256-row bucket spine, so the "
    "only data-sized stage is the (source, bucket) register shuffle.",
)
def hll_vocab_overlap_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    tok = (
        d.select(
            "source",
            F.explode(
                F.split(F.coalesce(F.col("text"), F.lit("")), " ")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    sparse = (
        tok.select("source", *hll.register_cols("w"))
        .groupBy("source", "bucket")
        .agg(F.max("r").alias("m_reg"))
    )
    spine = spark.range(hll.M).select(F.col("id").cast("int").alias("bucket"))
    dense = (
        sparse.select("source")
        .distinct()
        .crossJoin(F.broadcast(spine))
        .join(sparse, ["source", "bucket"], "left")
        .fillna(0, subset=["m_reg"])
    )
    per_src = hll.estimate_dense(dense, ["source"])
    a, b = dense.alias("a"), dense.alias("b")
    pair_regs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.col("a.bucket").alias("bucket"),
        F.greatest(F.col("a.m_reg"), F.col("b.m_reg")).alias("m_reg"),
    )
    pair_est = hll.estimate_dense(pair_regs, ["src_a", "src_b"])
    vocab = tok.distinct()
    sizes = vocab.groupBy("source").agg(F.count("*").alias("nv"))
    va, vb = vocab.alias("va"), vocab.alias("vb")
    inter = (
        va.join(
            vb,
            (F.col("va.w") == F.col("vb.w"))
            & (F.col("va.source") < F.col("vb.source")),
        )
        .groupBy(
            F.col("va.source").alias("src_a"),
            F.col("vb.source").alias("src_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    ea = per_src.select(
        F.col("source").alias("src_a"), F.col("est").alias("est_a")
    )
    eb = per_src.select(
        F.col("source").alias("src_b"), F.col("est").alias("est_b")
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("nv").alias("nv_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("nv").alias("nv_b"))
    exact_union = (
        F.col("nv_a") + F.col("nv_b") - F.coalesce(F.col("n_common"), F.lit(0))
    )
    return (
        pair_est.join(F.broadcast(ea), "src_a")
        .join(F.broadcast(eb), "src_b")
        .join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .join(inter, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            exact_union.cast("long").alias("exact_union"),
            F.round(F.col("est"), 4).alias("est_union"),
            F.coalesce(F.col("n_common"), F.lit(0))
            .cast("long")
            .alias("exact_inter"),
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est"), 4
            ).alias("est_inter"),
            F.round(
                F.lit(100.0)
                * (F.col("est") - exact_union)
                / exact_union,
                4,
            ).alias("union_err_pct"),
            (
                F.abs(F.col("est") - exact_union) / exact_union
                <= F.lit(0.195)
            ).alias("union_within_budget"),
        )
    )


# Count-min sketch geometry: d=4 rows x w=256 columns; row r hashes
# key "r_<key>" through the same md5 bucket extractor. Probe cohort:
# ~10% of users by md5 bucket < 26.
_CMS_D = 4
_CMS_PROBE_BUCKETS = 26


def _cms_key_sql(r: int, col: str) -> str:
    return f"concat('{r}_', CAST({col} AS STRING))"


def _cms_duck_key_sql(r: int, col: str) -> str:
    return f"concat('{r}_', CAST({col} AS VARCHAR))"


@register(
    "cms_user_counts_events",
    f"""
    WITH keyed AS (
      SELECT user_id, COUNT(*) AS n FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id),
    cells AS (
      SELECT r, col, CAST(SUM(n) AS BIGINT) AS c FROM (
        {" UNION ALL ".join(
            f'''SELECT {r} AS r,
                       {hll.duck_bucket_sql(_cms_duck_key_sql(r, "user_id"))}
                         AS col,
                       n FROM keyed'''
            for r in range(_CMS_D)
        )})
      GROUP BY r, col),
    total AS (SELECT CAST(SUM(n) AS BIGINT) AS total_n FROM keyed),
    probes AS (
      SELECT user_id, n AS exact_n FROM keyed
      WHERE {hll.duck_bucket_sql("user_id")} < {_CMS_PROBE_BUCKETS}),
    est AS (
      SELECT p.user_id, p.exact_n, MIN(c.c) AS est_n
      FROM probes p
      JOIN cells c ON c.col = CASE c.r
        {" ".join(
            f'''WHEN {r} THEN
                {hll.duck_bucket_sql(_cms_duck_key_sql(r, "p.user_id"))}'''
            for r in range(_CMS_D)
        )} END
      GROUP BY p.user_id, p.exact_n)
    SELECT e.user_id, e.exact_n, e.est_n,
           (e.est_n - e.exact_n) AS overestimate,
           (e.est_n >= e.exact_n) AS never_underestimates,
           (e.est_n - e.exact_n
              <= CAST(ceil(2.718281828459045 * t.total_n / 256.0)
                      AS BIGINT)) AS within_eps_budget
    FROM est e, total t
    """,
    doc="Count-min sketch (Cormode-Muthukrishnan), deterministic md5 "
    "twin: d=4 x w=256 counter cells built from per-key partial counts "
    "(map-side combinable — the scatter works on the pre-aggregated "
    "key frame, not raw rows), then point-frequency estimates for a "
    "deterministic ~10% probe cohort as min over the 4 row cells. "
    "Verdict columns pin BOTH guarantees: never_underestimates (hard "
    "CMS invariant — est >= exact always) and the eps-budget "
    "overestimate bound e/w * N. Complements heavy_hitters_events "
    "(Misra-Gries tracks the top keys; CMS answers ANY key's frequency "
    "from d*w = 1024 longs of mergeable state — cells add across "
    "partitions/days exactly as HLL registers max). At 100 TB the "
    "sketch state is constant-size and the only data-sized stage is "
    "the keyed partial count.",
)
def cms_user_counts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE keyed pass (review r05: the naive branch-per-row shape scanned
    # events 9x): the keyed frame explodes into the 4 scatter rows plus
    # a probe marker row (r = -1) in a single generator, so every
    # consumer sits above the same keyed-aggregate exchange and AQE
    # dedupes it via exchange reuse (plan-gated). The per-row total
    # rides on the cell frame as a 4-partition window over <= d*w rows.
    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    keyed = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    scatter = [
        F.struct(
            F.lit(r).alias("r"),
            F.expr(
                hll.spark_bucket_sql(_cms_key_sql(r, "user_id"))
            ).alias("col"),
        )
        for r in range(_CMS_D)
    ]
    probe_marker = F.when(
        F.expr(hll.spark_bucket_sql("user_id")) < _CMS_PROBE_BUCKETS,
        F.array(
            F.struct(
                F.lit(-1).alias("r"), F.lit(-1).cast("int").alias("col")
            )
        ),
    ).otherwise(F.array().cast("array<struct<r:int,col:int>>"))
    rows = keyed.select(
        "user_id",
        "n",
        F.explode(F.concat(F.array(*scatter), probe_marker)).alias("rc"),
    ).select("user_id", "n", F.col("rc.r").alias("r"), F.col("rc.col").alias("col"))
    cells = (
        rows.where(F.col("r") >= 0)
        .groupBy("r", "col")
        .agg(F.sum("n").cast("long").alias("c"))
    )
    from pyspark.sql import Window

    # total N per sketch row: each r partition saw every key once, so
    # the window is over <= w cells in 4 bounded partitions
    cells2 = cells.withColumn(
        "total_n", F.sum("c").over(Window.partitionBy("r"))
    )
    probes = rows.where(F.col("r") == -1).select(
        "user_id", F.col("n").alias("exact_n")
    )
    melted = probes.select(
        "user_id",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.expr(
                            hll.spark_bucket_sql(_cms_key_sql(r, "user_id"))
                        ).alias("col"),
                    )
                    for r in range(_CMS_D)
                ]
            )
        ).alias("rc"),
    ).select(
        "user_id", "exact_n", F.col("rc.r").alias("r"), F.col("rc.col").alias("col")
    )
    est = (
        melted.join(F.broadcast(cells2), ["r", "col"])
        .groupBy("user_id", "exact_n")
        .agg(
            F.min("c").cast("long").alias("est_n"),
            F.max("total_n").cast("long").alias("total_n"),
        )
    )
    eps_bound = F.ceil(
        F.lit(2.718281828459045) * F.col("total_n") / F.lit(256.0)
    ).cast("long")
    return est.select(
        "user_id",
        "exact_n",
        "est_n",
        (F.col("est_n") - F.col("exact_n")).alias("overestimate"),
        (F.col("est_n") >= F.col("exact_n")).alias("never_underestimates"),
        (F.col("est_n") - F.col("exact_n") <= eps_bound).alias(
            "within_eps_budget"
        ),
    )


# Bloom filter geometry: m=8192 bits, k=3 md5-salted hashes. Bit of
# key under salt r: first 4 md5 hex chars of "r_<key>" mod m.
_BLOOM_M = 8192
_BLOOM_K = 3


def _bloom_bit_sql(r: int, col: str, cast: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(concat('{r}_', CAST({col} AS VARCHAR)))"
        f", 1, 4)) AS INTEGER) % {_BLOOM_M}"
        if cast == "duck"
        else f"CAST(conv(substr(md5(concat('{r}_', CAST({col} AS STRING)))"
        f", 1, 4), 16, 10) AS INT) % {_BLOOM_M}"
    )


@register(
    "bloom_membership_customers",
    f"""
    WITH members AS (
      SELECT DISTINCT o_custkey AS k FROM orders WHERE o_custkey IS NOT NULL),
    bits AS (
      SELECT DISTINCT bit FROM (
        {" UNION ALL ".join(
            f"SELECT {_bloom_bit_sql(r, 'k', 'duck')} AS bit FROM members"
            for r in range(_BLOOM_K)
        )})),
    probes AS (
      SELECT c_custkey AS k FROM customer
      UNION ALL
      SELECT -c_custkey - 1 AS k FROM customer),
    melted AS (
      {" UNION ALL ".join(
          f'''SELECT k, {_bloom_bit_sql(r, 'k', 'duck')} AS bit
              FROM probes'''
          for r in range(_BLOOM_K)
      )}),
    claims AS (
      SELECT m.k, (COUNT(b.bit) = {_BLOOM_K}) AS claimed
      FROM melted m LEFT JOIN bits b ON b.bit = m.bit
      GROUP BY m.k),
    lab AS (
      SELECT c.k, c.claimed, (mm.k IS NOT NULL) AS member
      FROM claims c LEFT JOIN members mm ON mm.k = c.k),
    agg AS (
      SELECT CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
               AS n_members,
             CAST(COUNT(*) AS BIGINT) AS n_probes,
             CAST(SUM(CASE WHEN claimed THEN 1 ELSE 0 END) AS BIGINT)
               AS claimed,
             CAST(SUM(CASE WHEN claimed AND NOT member THEN 1 ELSE 0 END)
                  AS BIGINT) AS false_positives,
             CAST(SUM(CASE WHEN member AND NOT claimed THEN 1 ELSE 0 END)
                  AS BIGINT) AS missed
      FROM lab),
    fill AS (
      SELECT *,
             1.0 - exp(CAST({_BLOOM_K} AS DOUBLE) * n_members
                       * ln(1.0 - CAST(1 AS DOUBLE) / {_BLOOM_M})) AS fl
      FROM agg)
    SELECT n_members, n_probes, claimed, false_positives,
           round(CAST(false_positives AS DOUBLE)
                 / nullif(n_probes - n_members, 0), 6) AS fp_rate,
           round(fl * fl * fl, 6) AS expected_fp_rate,
           (missed = 0) AS no_false_negatives,
           (CAST(false_positives AS DOUBLE)
              / nullif(n_probes - n_members, 0)
            <= 3.0 * fl * fl * fl + 0.01) AS fp_within_budget
    FROM fill
    """,
    doc="Bloom-filter membership summary (completes the mergeable-"
    "sketch trio: HLL=cardinality, CMS=frequency, Bloom=membership): "
    "m=8192 bits, k=3 deterministic md5-salted hashes over the "
    "customers-with-orders key set, probed with EVERY customer. "
    "Verdicts pin the hard invariant (no false negatives — a Bloom "
    "filter may only over-claim) and measured-vs-theory FPR "
    "((1-e^(-kn/m))^k, ln/exp-only math, k-th power as plain "
    "multiplication), so the row stays honest at any scale — a "
    "saturated filter raises BOTH measured and expected rates "
    "together. Bits OR-merge across partitions/batches (the DISTINCT "
    "bit union IS the merge); at 100 TB the filter is m bits of "
    "state built by one map-side-combinable pass, and the probe join "
    "broadcasts <= m bit rows. This is the hand-rolled, oracle-"
    "checkable twin of the runtime BloomFilterMightContain the "
    "engine's own runtime_filter_join_revenue plan-gates.",
)
def bloom_membership_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    members = (
        orders.where(F.col("o_custkey").isNotNull())
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bit_structs = [
        F.struct(F.expr(_bloom_bit_sql(r, "k", "spark")).alias("bit"))
        for r in range(_BLOOM_K)
    ]
    bits = (
        members.select(F.explode(F.array(*bit_structs)).alias("s"))
        .select(F.col("s.bit").alias("bit"))
        .distinct()
    )
    # probe with every real customer PLUS a NEGATED twin per customer —
    # guaranteed non-members at ANY scale factor (custkeys are positive,
    # so -k-1 <= -2 can never collide with a real key; an additive
    # offset collides once SF grows past the offset — ADVICE r05), so
    # the measured FPR is never degenerate (at small SF every customer
    # has orders and the non-member count would otherwise be zero ->
    # NULL rate)
    probes = cust.select(F.col("c_custkey").alias("k")).unionByName(
        cust.select((-F.col("c_custkey") - 1).alias("k"))
    )
    melted = probes.select(
        "k", F.explode(F.array(*bit_structs)).alias("s")
    ).select("k", F.col("s.bit").alias("bit"))
    claims = (
        melted.join(F.broadcast(bits.withColumnRenamed("bit", "b")),
                    F.col("bit") == F.col("b"), "left")
        .groupBy("k")
        .agg((F.count("b") == _BLOOM_K).alias("claimed"))
    )
    lab = claims.join(
        members.withColumnRenamed("k", "mk"),
        F.col("k") == F.col("mk"),
        "left",
    ).select("k", "claimed", F.col("mk").isNotNull().alias("member"))
    agg = lab.agg(
        F.sum(F.when(F.col("member"), 1).otherwise(0))
        .cast("long")
        .alias("n_members"),
        F.count("*").cast("long").alias("n_probes"),
        F.sum(F.when(F.col("claimed"), 1).otherwise(0))
        .cast("long")
        .alias("claimed"),
        F.sum(F.when(F.col("claimed") & ~F.col("member"), 1).otherwise(0))
        .cast("long")
        .alias("false_positives"),
        F.sum(F.when(F.col("member") & ~F.col("claimed"), 1).otherwise(0))
        .cast("long")
        .alias("missed"),
    )
    fl = F.lit(1.0) - F.exp(
        F.lit(float(_BLOOM_K))
        * F.col("n_members")
        * F.log(F.lit(1.0) - F.lit(1.0) / F.lit(_BLOOM_M))
    )
    fpr = F.col("false_positives").cast("double") / F.nullif(
        F.col("n_probes") - F.col("n_members"), F.lit(0)
    )
    return agg.select(
        "n_members",
        "n_probes",
        "claimed",
        "false_positives",
        F.round(fpr, 6).alias("fp_rate"),
        F.round(fl * fl * fl, 6).alias("expected_fp_rate"),
        (F.col("missed") == 0).alias("no_false_negatives"),
        (fpr <= F.lit(3.0) * fl * fl * fl + F.lit(0.01)).alias(
            "fp_within_budget"
        ),
    )


# Deterministic ~5% customer cohort: md5 register index < 13 (13/256).
_DEL_BUCKETS = 13


@register(
    "deletion_cascade_customers",
    f"""
    WITH cohort AS (
      SELECT c_custkey FROM customer
      WHERE {hll.duck_bucket_sql("c_custkey")} < {_DEL_BUCKETS}),
    o AS (
      SELECT o.o_orderkey, (c.c_custkey IS NOT NULL) AS hit
      FROM orders o LEFT JOIN cohort c ON o.o_custkey = c.c_custkey),
    ok AS (SELECT o_orderkey FROM o WHERE hit),
    l AS (
      SELECT (k.o_orderkey IS NOT NULL) AS hit
      FROM lineitem li LEFT JOIN ok k ON li.l_orderkey = k.o_orderkey)
    SELECT tbl, rows_total, rows_affected,
           round(100.0 * rows_affected / rows_total, 4) AS pct
    FROM (
      SELECT 'customer' AS tbl, COUNT(*) AS rows_total,
             CAST(SUM(CASE WHEN {hll.duck_bucket_sql("c_custkey")}
                                < {_DEL_BUCKETS} THEN 1 ELSE 0 END)
                  AS BIGINT) AS rows_affected
      FROM customer
      UNION ALL
      SELECT 'orders', COUNT(*),
             CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) FROM o
      UNION ALL
      SELECT 'lineitem', COUNT(*),
             CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) FROM l)
    """,
    doc="Right-to-be-forgotten impact report: for a deterministic ~5% "
    "customer cohort (md5 bucket < 13/256 — stands in for an uploaded "
    "deletion list), count the rows each table would lose when the "
    "deletion cascades customer -> orders -> lineitem. Each fact scans "
    "ONCE with a key-only left join carrying the hit flag (total and "
    "affected counted in the same pass — no per-table second scan), "
    "and the cascade joins are key-only frames, never data-sized "
    "intermediates. At 100 TB this is the deletion-planning query run "
    "before a GDPR purge: the key frames broadcast or shuffle by key, "
    "AQE picks per-stage, and no raw payload column ever moves. "
    "Reference contrast: no deletion/compliance surface exists "
    "(nearest row pruning is the rank<=k comment cap, "
    "REDDIT-Nettoyage-Comms.py:67).",
)
def deletion_cascade_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.expr(hll.spark_bucket_sql("c_custkey"))
    cohort = cust.where(bucket < _DEL_BUCKETS).select("c_custkey")
    c_row = cust.agg(
        F.lit("customer").alias("tbl"),
        F.count("*").alias("rows_total"),
        F.sum(F.when(bucket < _DEL_BUCKETS, 1).otherwise(0))
        .cast("long")
        .alias("rows_affected"),
    )
    o = orders.join(
        cohort, orders["o_custkey"] == cohort["c_custkey"], "left"
    ).select("o_orderkey", F.col("c_custkey").isNotNull().alias("hit"))
    o_row = o.agg(
        F.lit("orders").alias("tbl"),
        F.count("*").alias("rows_total"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0))
        .cast("long")
        .alias("rows_affected"),
    )
    ok = o.where("hit").select("o_orderkey")
    l_row = (
        li.join(ok, li["l_orderkey"] == ok["o_orderkey"], "left")
        .select(F.col("o_orderkey").isNotNull().alias("hit"))
        .agg(
            F.lit("lineitem").alias("tbl"),
            F.count("*").alias("rows_total"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0))
            .cast("long")
            .alias("rows_affected"),
        )
    )
    return (
        c_row.unionByName(o_row)
        .unionByName(l_row)
        .select(
            "tbl",
            "rows_total",
            "rows_affected",
            F.round(
                F.lit(100.0) * F.col("rows_affected") / F.col("rows_total"),
                4,
            ).alias("pct"),
        )
    )
