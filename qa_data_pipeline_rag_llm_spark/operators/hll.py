"""Deterministic HyperLogLog building blocks (md5 registers, p=8).

Shared by the batch union query (`plans/queries_mergeable.py`) and its
streaming twin: the register extraction is a pure projection, register
maintenance is `groupBy(bucket).max(rho)` — which in a stream is a
stateful aggregation whose state IS the sketch (256 longs, merged by
max across micro-batches exactly as partitions merge in batch). The
estimator follows Flajolet et al. 2007: raw harmonic-mean estimate with
the linear-counting small-range branch; every 2^(-M_j) term is a dyadic
rational summed as a scaled integer (1 << (61 - M_j)) into DECIMAL so
both engines reach the single closing division bit-identically.

Scale: at 100 TB the register shuffle moves at most m rows per
partition after map-side combine; merging day-level or DC-level
sketches is a 256-row max — raw rows never move twice. Reference
contrast: no distinct-count surface exists there; its nearest
aggregation is driver-side pandas groupby→to_dict
(``PLATFORM-contextual-Chunking.py:97``) — single-node only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M = 256  # registers (p=8)
RHO_MAX = 61  # 60-bit rank word -> rho in [1, 61]
TWO61 = 1 << 61  # scaled-integer denominator for sum(2^-M_j)
# alpha_m * m^2 * 2^61 as one Python double, inlined verbatim on both
# engines so the closing division is bit-identical.
ALPHA_NUM = repr(0.7213 / (1.0 + 1.079 / M) * M * M * float(TWO61))
LC_CUTOFF = 2.5 * M  # linear-counting branch threshold


def spark_bucket_sql(key_sql: str) -> str:
    """Register index: first 2 md5 hex chars of the key (0..255)."""
    return f"CAST(conv(substr(md5(CAST({key_sql} AS STRING)), 1, 2), 16, 10) AS INT)"


def spark_w_sql(key_sql: str) -> str:
    """60-bit rank word: md5 hex chars 3-17."""
    return f"CAST(conv(substr(md5(CAST({key_sql} AS STRING)), 3, 15), 16, 10) AS BIGINT)"


def duck_bucket_sql(key_sql: str) -> str:
    return f"CAST(('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 2)) AS INTEGER)"


def duck_w_sql(key_sql: str) -> str:
    return f"CAST(('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 3, 15)) AS BIGINT)"


def rho_from_w(w: Column) -> Column:
    """rho = leading zeros of the 60-bit word + 1 = 61 - bitlength(w);
    bin() drops leading zeros identically in Spark and DuckDB."""
    return (
        F.when(w == 0, F.lit(RHO_MAX))
        .otherwise(F.lit(RHO_MAX) - F.length(F.bin(w)))
    )


def duck_rho_sql(key_sql: str) -> str:
    w = duck_w_sql(key_sql)
    return f"CASE WHEN {w} = 0 THEN {RHO_MAX} ELSE {RHO_MAX} - length(bin({w})) END"


def register_cols(key_sql: str) -> list[Column]:
    """(bucket, r) projection — the sketch's map-side state."""
    return [
        F.expr(spark_bucket_sql(key_sql)).alias("bucket"),
        rho_from_w(F.expr(spark_w_sql(key_sql))).alias("r"),
    ]


def estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """(bucket, m_reg) registers -> per-group (v, est): empty-register
    count and the branch-selected cardinality estimate (double)."""
    term = F.expr(
        f"CAST(shiftleft(CAST(1 AS BIGINT), {RHO_MAX} - m_reg)"
        " AS DECIMAL(38,0))"
    )
    agg = regs.groupBy(*group_cols).agg(
        (F.lit(M) - F.count("*")).cast("long").alias("v"),
        (
            F.sum(term)
            + F.lit(M).cast("decimal(38,0)") * F.lit(TWO61)
            - F.count("*").cast("decimal(38,0)") * F.lit(TWO61)
        )
        .cast("decimal(38,0)")
        .alias("s"),
    )
    raw = F.expr(ALPHA_NUM) / F.col("s").cast("double")
    est = F.when(
        (F.col("v") > 0) & (raw <= F.lit(LC_CUTOFF)),
        F.lit(float(M)) * F.log(F.lit(float(M)) / F.col("v")),
    ).otherwise(raw)
    return agg.select(*group_cols, "v", est.alias("est"))


def estimate_dense(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Like :func:`estimate` but over DENSE register vectors (every
    group carries all m buckets, empty ones as m_reg = 0 — the shape
    set-operation joins produce). term(0) = 2^61 is exactly the empty-
    register contribution, so only the empty-count changes."""
    term = F.expr(
        f"CAST(shiftleft(CAST(1 AS BIGINT), {RHO_MAX} - m_reg)"
        " AS DECIMAL(38,0))"
    )
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("m_reg") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v"),
        F.sum(term).cast("decimal(38,0)").alias("s"),
    )
    raw = F.expr(ALPHA_NUM) / F.col("s").cast("double")
    est = F.when(
        (F.col("v") > 0) & (raw <= F.lit(LC_CUTOFF)),
        F.lit(float(M)) * F.log(F.lit(float(M)) / F.col("v")),
    ).otherwise(raw)
    return agg.select(*group_cols, "v", est.alias("est"))


def duck_estimate_dense_sql(regs_cte: str, group_cols: str) -> str:
    """Oracle twin of :func:`estimate_dense` over a CTE with columns
    (``group_cols``..., bucket, m_reg); m_reg = 0 marks empty."""
    s = (
        f"SUM(CAST((CAST(1 AS BIGINT) << ({RHO_MAX} - m_reg))"
        " AS DECIMAL(38,0)))"
    )
    v = "SUM(CASE WHEN m_reg = 0 THEN 1 ELSE 0 END)"
    return f"""
    SELECT {group_cols},
           CAST({v} AS BIGINT) AS v,
           CASE WHEN {v} > 0
                     AND {ALPHA_NUM} / CAST({s} AS DOUBLE) <= {LC_CUTOFF}
                THEN CAST({M} AS DOUBLE) * ln(CAST({M} AS DOUBLE) / ({v}))
                ELSE {ALPHA_NUM} / CAST({s} AS DOUBLE) END AS est
    FROM {regs_cte} GROUP BY {group_cols}
    """


def duck_estimate_sql(regs_cte: str, group_col: str) -> str:
    """Oracle twin of :func:`estimate` over a CTE named ``regs_cte``
    with columns (``group_col``, bucket, m_reg)."""
    return f"""
    SELECT {group_col},
           CAST({M} - COUNT(*) AS BIGINT) AS v,
           CASE WHEN ({M} - COUNT(*)) > 0
                     AND {ALPHA_NUM} / CAST(
                           SUM(CAST((CAST(1 AS BIGINT) << ({RHO_MAX} - m_reg))
                               AS DECIMAL(38,0)))
                           + CAST({M} AS DECIMAL(38,0)) * {TWO61}
                           - CAST(COUNT(*) AS DECIMAL(38,0)) * {TWO61}
                         AS DOUBLE) <= {LC_CUTOFF}
                THEN CAST({M} AS DOUBLE)
                     * ln(CAST({M} AS DOUBLE) / ({M} - COUNT(*)))
                ELSE {ALPHA_NUM} / CAST(
                       SUM(CAST((CAST(1 AS BIGINT) << ({RHO_MAX} - m_reg))
                           AS DECIMAL(38,0)))
                       + CAST({M} AS DECIMAL(38,0)) * {TWO61}
                       - CAST(COUNT(*) AS DECIMAL(38,0)) * {TWO61}
                     AS DOUBLE) END AS est
    FROM {regs_cte} GROUP BY {group_col}
    """
