"""Registry entries: mergeable-summary algebra — the property that makes
100 TB aggregation embarrassingly parallel.

The reference's only cardinality/sampling surface is exact pandas ops on
a collected driver frame (`Mise-En-Forme-CSV-Donnees.py`'s keep-first +
`value_counts` shapes); at corpus scale both become mergeable summaries:
each partition emits a tiny state, states merge associatively, and the
final answer never touches raw rows again. Spark's built-ins
(`approx_count_distinct`, `hll_sketch_agg`, `sampleBy`) implement this
but are implementation-defined, so they can never value-hash-match a
DuckDB oracle (the `sketch_stats_events` lesson). This family instead
implements the SAME algebra deterministically from md5 — every register
and every reservoir key is a pure function of the data, replayed
bit-identically by the oracle:

* ``hll_union_users_events`` — a from-scratch HyperLogLog (p=8, m=256
  registers, Flajolet et al. 2007 estimator with the linear-counting
  small-range correction) whose register extraction is a map-side-
  combinable ``groupBy(type, bucket).max(rho)``, plus the union proof:
  per-type register vectors max-merged into an ``ALL`` scope estimate
  distinct-users-across-all-types WITHOUT rescanning — the set-union-
  without-re-aggregation property that makes sketches composable across
  partitions, days, and datacenters.
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

from qa_data_pipeline_rag_llm_spark.operators.ranking import salted_top_k
from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register

# HLL geometry: p=8 -> m=256 registers; md5 supplies 2 hex chars of
# bucket + 15 hex chars (60 bits) of rank material, so rho in [1, 61].
_M = 256
_RHO_MAX = 61
_TWO61 = 1 << 61  # scaled-integer denominator for sum(2^-M_j)
# alpha_m * m^2 * 2^61 as one Python double, inlined verbatim on both
# engines so the single closing division is bit-identical.
_ALPHA_NUM = repr(0.7213 / (1.0 + 1.079 / _M) * _M * _M * float(_TWO61))
_LC_CUTOFF = 2.5 * _M  # linear-counting branch threshold

# md5-derived fields, identical in both engines (parity pinned by
# tests/test_mergeable.py): hex chars 1-2 -> register index, 3-17 -> the
# 60-bit rank word. rho = leading zeros in the 60-bit word + 1 =
# 61 - bitlength(w); bin() drops leading zeros in both engines.
_SPARK_BUCKET = (
    "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 2), 16, 10) AS INT)"
)
_SPARK_W = (
    "CAST(conv(substr(md5(CAST(user_id AS STRING)), 3, 15), 16, 10) AS BIGINT)"
)
_DUCK_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2)) AS INTEGER)"
)
_DUCK_W = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 15)) AS BIGINT)"
)


@register(
    "hll_union_users_events",
    f"""
    WITH raw AS (
      SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL),
    rho AS (
      SELECT event_type, {_DUCK_BUCKET} AS bucket,
             CASE WHEN {_DUCK_W} = 0 THEN {_RHO_MAX}
                  ELSE {_RHO_MAX} - length(bin({_DUCK_W})) END AS r
      FROM raw),
    regs AS (
      SELECT event_type, bucket, MAX(r) AS m_reg
      FROM rho GROUP BY event_type, bucket),
    allregs AS (
      SELECT event_type, bucket, m_reg FROM regs
      UNION ALL
      SELECT 'ALL' AS event_type, bucket, MAX(m_reg) AS m_reg
      FROM regs GROUP BY bucket),
    est AS (
      SELECT event_type, CAST({_M} - COUNT(*) AS BIGINT) AS v,
             CAST(SUM(CAST((CAST(1 AS BIGINT) << ({_RHO_MAX} - m_reg))
                           AS DECIMAL(38,0)))
                  + CAST({_M} AS DECIMAL(38,0)) * {_TWO61}
                  - CAST(COUNT(*) AS DECIMAL(38,0)) * {_TWO61}
                  AS DECIMAL(38,0)) AS s
      FROM allregs GROUP BY event_type),
    ex AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
      FROM raw GROUP BY event_type
      UNION ALL
      SELECT 'ALL' AS event_type, COUNT(DISTINCT user_id) FROM raw),
    fin AS (
      SELECT e.event_type AS scope, x.exact_users, e.v AS empty_registers,
             CASE WHEN e.v > 0
                       AND {_ALPHA_NUM} / CAST(e.s AS DOUBLE) <= {_LC_CUTOFF}
                  THEN CAST({_M} AS DOUBLE)
                       * ln(CAST({_M} AS DOUBLE) / e.v)
                  ELSE {_ALPHA_NUM} / CAST(e.s AS DOUBLE) END AS est
      FROM est e JOIN ex x ON e.event_type = x.event_type)
    SELECT scope, exact_users, empty_registers,
           round(est, 4) AS est_users,
           round(100.0 * (est - exact_users) / exact_users, 4) AS err_pct,
           (abs(est - exact_users) / exact_users <= 0.195) AS within_budget
    FROM fin
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
    "cross-engine. Reference contrast: REDDIT-Mise-En-Forme*.py "
    "counts uniques via driver-side pandas nunique — single-node only.",
)
def hll_union_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = F.expr(_SPARK_W)
    rho = ev.select(
        "event_type",
        F.expr(_SPARK_BUCKET).alias("bucket"),
        F.when(w == 0, F.lit(_RHO_MAX))
        .otherwise(F.lit(_RHO_MAX) - F.length(F.bin(w)))
        .alias("r"),
    )
    regs = rho.groupBy("event_type", "bucket").agg(F.max("r").alias("m_reg"))
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("m_reg").alias("m_reg"))
        .select(F.lit("ALL").alias("event_type"), "bucket", "m_reg")
    )
    term = F.expr(
        f"CAST(shiftleft(CAST(1 AS BIGINT), {_RHO_MAX} - m_reg)"
        " AS DECIMAL(38,0))"
    )
    est = (
        regs.unionByName(merged)
        .groupBy("event_type")
        .agg(
            (F.lit(_M) - F.count("*")).cast("long").alias("v"),
            (
                F.sum(term)
                + F.lit(_M).cast("decimal(38,0)") * F.lit(_TWO61)
                - F.count("*").cast("decimal(38,0)") * F.lit(_TWO61)
            )
            .cast("decimal(38,0)")
            .alias("s"),
        )
    )
    ex = (
        ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_users"))
        .unionByName(
            ev.agg(F.count_distinct("user_id").alias("exact_users")).select(
                F.lit("ALL").alias("event_type"), "exact_users"
            )
        )
    )
    raw_est = F.expr(_ALPHA_NUM) / F.col("s").cast("double")
    e = F.when(
        (F.col("v") > 0) & (raw_est <= F.lit(_LC_CUTOFF)),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / F.col("v")),
    ).otherwise(raw_est)
    return (
        est.join(ex, "event_type")
        .select(
            F.col("event_type").alias("scope"),
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
    )


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
               ORDER BY ln(CAST(CAST(('0x' || substr(md5(
                              CAST(doc_id AS VARCHAR)), 3, 15)) AS BIGINT)
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
    "Reference contrast: the reference samples via pandas .sample "
    "(RNG, driver-bound; REDDIT-Mise-En-Forme-Finale.py shapes).",
)
def weighted_reservoir_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u_num = (
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 3, 15), 16, 10)"
            " AS BIGINT)"
        )
        + 1
    )
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
