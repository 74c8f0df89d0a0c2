"""Registry entries: experimentation / engagement analytics.

Neither exists in the reference (it has no metrics layer at all —
SURVEY.md §2.5 lists zero sum/avg aggregates), but any pipeline that
ships model or ranking changes over a 100 TB event stream needs them:

  * ``cuped_ab_events`` — CUPED variance-reduced A/B readout
    (Deng et al., WSDM'13): per-unit pre-period covariate, pooled
    theta = cov(x,y)/var(x), adjusted per-arm means. All moment sums
    are exact scaled integers; theta and the adjusted means are a
    fixed sequence of double ops replayed identically by the oracle.
  * ``decayed_leaderboard_events`` — exponentially time-decayed
    engagement scores (half-life analytics, the batch twin of a
    decaying streaming counter). exp() is bit-stable across engines
    on identical doubles (r3-probed), and each per-event decay factor
    is rounded to a scaled long BEFORE summation, so the aggregate is
    order-independent and hash-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register

#: events.value has 2 fractional digits — scale-100 longs are exact
V_SCALE = 100

#: decay time constant: 7 days in microseconds
TAU_US = 7 * 86400 * 1_000_000


@register(
    "cuped_ab_events",
    f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(SUM(CASE WHEN (epoch_us(ts) // 86400000000) % 30 < 15
                  THEN CAST(round(value * {V_SCALE}) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x_c,
             CAST(SUM(CASE WHEN (epoch_us(ts) // 86400000000) % 30 < 15
                  THEN 0
                  ELSE CAST(round(value * {V_SCALE}) AS BIGINT)
                  END) AS BIGINT) AS y_c
      FROM events GROUP BY user_id),
    pool AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(x_c AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(y_c AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(x_c AS DECIMAL(38,0))
                           * CAST(y_c AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(x_c AS DECIMAL(38,0))
                           * CAST(x_c AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS DOUBLE) AS sxx
      FROM per_user),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS DOUBLE) AS n_arm,
             CAST(CAST(SUM(CAST(x_c AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sx_arm,
             CAST(CAST(SUM(CAST(y_c AS DECIMAL(38,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sy_arm
      FROM per_user GROUP BY arm)
    SELECT arm, CAST(n_arm AS BIGINT) AS n_users,
           round(sy_arm / n_arm / {V_SCALE}, 6) AS mean_y,
           round(((sy_arm / n_arm)
                  - (((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)))
                    * ((sx_arm / n_arm) - (sx / n))) / {V_SCALE}, 6)
             AS mean_y_cuped
    FROM arms, pool
    """,
    doc="CUPED variance-reduced A/B readout: per-user pre-period "
    "(first half of the 30-day cycle) covariate vs experiment-period "
    "metric, pooled theta = cov(x,y)/var(x) from EXACT decimal moment "
    "sums, per-arm adjusted means. One fact scan -> per-user shuffle; "
    "the pooled moments and the per-arm rollup both re-aggregate the "
    "same user-level frame (the exchange dedupes, q11 pattern) and a "
    "2x1-row broadcast closes it — at 100 TB the only data-sized "
    "shuffle is the per-unit groupBy every readout needs anyway.",
)
def cuped_ab_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v_c = F.round(F.col("value") * V_SCALE).cast("long")
    is_ref = F.expr("(unix_micros(ts) div 86400000000) % 30") < 15
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(is_ref, v_c).otherwise(F.lit(0))).alias("x_c"),
        F.sum(F.when(is_ref, F.lit(0)).otherwise(v_c)).alias("y_c"),
    ).withColumn("arm", F.col("user_id") % 2)
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pool = per_user.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(d("x_c")).cast("decimal(38,0)").cast("double").alias("sx"),
        F.sum(d("y_c")).cast("decimal(38,0)").cast("double").alias("sy"),
        F.sum(d("x_c") * d("y_c"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("sxy"),
        F.sum(d("x_c") * d("x_c"))
        .cast("decimal(38,0)")
        .cast("double")
        .alias("sxx"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("double").alias("n_arm"),
        F.sum(d("x_c")).cast("decimal(38,0)").cast("double").alias("sx_arm"),
        F.sum(d("y_c")).cast("decimal(38,0)").cast("double").alias("sy_arm"),
    )
    theta = ((F.col("n") * F.col("sxy")) - (F.col("sx") * F.col("sy"))) / (
        (F.col("n") * F.col("sxx")) - (F.col("sx") * F.col("sx"))
    )
    return arms.crossJoin(F.broadcast(pool)).select(
        "arm",
        F.col("n_arm").cast("long").alias("n_users"),
        F.round(F.col("sy_arm") / F.col("n_arm") / V_SCALE, 6).alias(
            "mean_y"
        ),
        F.round(
            (
                (F.col("sy_arm") / F.col("n_arm"))
                - theta
                * ((F.col("sx_arm") / F.col("n_arm")) - (F.col("sx") / F.col("n")))
            )
            / V_SCALE,
            6,
        ).alias("mean_y_cuped"),
    )


@register(
    "decayed_leaderboard_events",
    f"""
    WITH tmax AS (SELECT MAX(epoch_us(ts)) AS t_us FROM events),
    scored AS (
      SELECT event_type,
             CAST(round(value * {V_SCALE}) AS BIGINT)
               * CAST(round(exp(-(CAST(t_us - epoch_us(ts) AS DOUBLE)
                                  / {TAU_US}.0)) * 1000000000) AS BIGINT)
               AS contrib
      FROM events, tmax)
    SELECT event_type,
           round(CAST(SUM(CAST(contrib AS DECIMAL(38,0))) AS DOUBLE)
                 / {V_SCALE}.0 / 1000000000.0, 4) AS decayed_score,
           COUNT(*) AS n_events
    FROM scored GROUP BY event_type
    """,
    doc="Exponentially time-decayed engagement leaderboard (7-day time "
    "constant, anchored at the corpus max timestamp): per-event decay "
    "factor exp(-dt/tau) is rounded to a 1e9-scaled long BEFORE the "
    "sum, so the aggregate is an exact integer total — order-"
    "independent, hash-comparable, and exactly what a decaying counter "
    "service materializes in batch. One fact scan + one groupBy; the "
    "anchor max(ts) is a columnar agg broadcast back (1 row).",
)
def decayed_leaderboard_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    tmax = ev.agg(F.max(F.expr("unix_micros(ts)")).alias("t_us"))
    scored = ev.crossJoin(F.broadcast(tmax)).select(
        "event_type",
        (
            F.round(F.col("value") * V_SCALE).cast("long")
            * F.round(
                F.exp(
                    -(
                        (F.col("t_us") - F.expr("unix_micros(ts)")).cast(
                            "double"
                        )
                        / float(TAU_US)
                    )
                )
                * 1_000_000_000
            ).cast("long")
        ).alias("contrib"),
    )
    return scored.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("contrib").cast("decimal(38,0)")).cast("double")
            / float(V_SCALE)
            / 1e9,
            4,
        ).alias("decayed_score"),
        F.count("*").alias("n_events"),
    )
