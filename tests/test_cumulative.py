"""operators/cumulative.rank_cumsum: distributed global rank + running sum.

Parity against the naive single-task window (the thing it replaces),
determinism across repeated executions, and the regression that forced
the data-derived-bucket design: with a CACHED input under AQE, the two
plan branches can read the same shuffle through different coalesced
specs, so any physical-partition-id bucketing silently corrupts offsets
(first seen as 11 "deciles" at sf0.01 through the driver wrapper).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.operators.cumulative import rank_cumsum


def _frame(spark, n=5000, groups=997):
    return spark.range(n).select(
        F.col("id"),
        (F.hash(F.col("id").cast("string")) % groups).alias("k"),
        ((F.col("id") * 37) % 101 + 1).alias("v"),
    )


def _naive(df):
    w = Window.orderBy(F.desc("v"), "id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.select(
        "id",
        F.row_number().over(w).alias("rank"),
        F.sum("v").over(wc).alias("cumsum"),
    )


def test_rank_cumsum_matches_single_window(spark):
    df = _frame(spark)
    got = (
        rank_cumsum(df, [F.desc("v"), F.col("id")], "v", bucket_col="v", descending=True)
        .select("id", "rank", "cumsum")
        .collect()
    )
    want = _naive(df).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_rank_cumsum_deterministic_across_runs(spark):
    df = _frame(spark, n=3000)
    res = rank_cumsum(
        df, [F.desc("v"), F.col("id")], "v", bucket_col="v", descending=True
    ).select("id", "rank", "cumsum")
    a = sorted(map(tuple, res.collect()))
    b = sorted(map(tuple, res.collect()))
    assert a == b


def test_rank_cumsum_rank_is_dense_total_order(spark):
    df = _frame(spark, n=1000)
    rows = rank_cumsum(df, [F.desc("v"), F.col("id")], "v", bucket_col="v", descending=True).collect()
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    # running sum at the max rank equals the exact total
    total = df.agg(F.sum("v")).collect()[0][0]
    last = max(rows, key=lambda r: r["rank"])
    assert last["cumsum"] == total


def test_rank_cumsum_more_partitions_than_rows(spark):
    df = _frame(spark, n=7)
    got = rank_cumsum(
        df, [F.desc("v"), F.col("id")], "v",
        bucket_col="v", descending=True, num_buckets=32,
    ).collect()
    want = _naive(df).collect()
    assert sorted((r["id"], r["rank"], r["cumsum"]) for r in got) == sorted(
        map(tuple, want)
    )


def test_rank_cumsum_consistent_over_cached_input(spark):
    """The sf0.01 regression shape: cached input + AQE. Bucket ids must
    be a pure function of the data so both plan branches agree."""
    df = _frame(spark, n=4000).cache()
    try:
        df.count()  # materialize the cache
        got = rank_cumsum(
            df, [F.desc("v"), F.col("id")], "v",
            bucket_col="v", descending=True,
        ).select("id", "rank", "cumsum")
        want = _naive(df)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        df.unpersist()


def test_cogroup_survives_output_projection(spark, tables):
    """Regression (caught by the full sf0.01 sweep): with identical
    non-key column names on both cogroup sides, a downstream projection
    that reorders/prunes the udf output made Catalyst drop the right
    child's shared-name column — the Python worker got the purchase
    group with NO ts. The operator now renames the right value column;
    this pins the exact consumer shapes that failed (sorted-column
    select + count) against the plain collect that always worked."""
    from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
    from tests.conftest import SF_DIR

    df = REGISTRY["cogroup_reconcile_events"].spark(spark, SF_DIR)
    plain = df.collect()
    sorted_sel = df.select(*sorted(df.columns)).collect()
    assert df.count() == len(plain) == len(sorted_sel) > 0
    a = sorted(tuple(sorted(r.asDict().items())) for r in plain)
    b = sorted(tuple(sorted(r.asDict().items())) for r in sorted_sel)
    assert a == b


def test_rank_cumsum_property_random_frames(spark):
    """Hypothesis-style sweep: many random shapes (ties, skew, negatives,
    singleton) must all match the single-window reference."""
    import random

    rng = random.Random(42)
    for trial in range(6):
        n = rng.choice([1, 2, 17, 251, 1024])
        heavy = rng.random() < 0.5  # half the trials: massive tie skew
        rows = [
            (
                i,
                rng.choice([1, 1, 1, 7]) if heavy else rng.randint(-500, 500),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id long, v long")
        got = rank_cumsum(
            df, [F.desc("v"), F.col("id")], "v",
            bucket_col="v", descending=True,
            num_buckets=rng.choice([1, 2, 8, 64]),
        ).select("id", "rank", "cumsum")
        want = _naive(df)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), f"trial {trial} n={n} heavy={heavy}"


def test_rank_cumsum_null_bucket_key_fails_loud(spark):
    """NULL bucket keys must raise (with the operator's message), never
    silently rank inside the first bucket (advice r03)."""
    import pytest
    from pyspark.errors import PySparkException

    # single input partition: with sibling tasks, the task that throws
    # the assert races the stage-cancel of the others, and under suite
    # load the driver occasionally surfaces the SPARK_JOB_CANCELLED
    # wrapper instead of the assert message (observed flake r06); one
    # task makes the propagated error deterministic
    df = spark.range(0, 100, 1, 1).select(
        "id",
        F.when(F.col("id") != 7, (F.col("id") * 37) % 101 + 1).alias("v"),
    )
    res = rank_cumsum(
        df, [F.desc("v"), F.col("id")], "v", bucket_col="v", descending=True
    )
    with pytest.raises(PySparkException, match="must be non-null"):
        res.collect()


def test_rank_cumsum_multi_matches_per_column_windows(spark):
    from qa_data_pipeline_rag_llm_spark.operators.cumulative import (
        rank_cumsum_multi,
    )

    df = _frame(spark).withColumn("v2", (F.col("id") * 13) % 53)
    got = (
        rank_cumsum_multi(
            df,
            [F.col("v"), F.col("id")],
            ["v", "v2"],
            bucket_col="v",
            num_buckets=16,
        )
        .select("id", "rank", "cum_v", "cum_v2")
        .collect()
    )
    w = Window.orderBy("v", "id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.select(
        "id",
        F.row_number().over(w).alias("rank"),
        F.sum("v").over(wc).alias("cum_v"),
        F.sum("v2").over(wc).alias("cum_v2"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_rank_cumsum_multi_null_bucket_key_fails_loud(spark):
    import pytest
    from pyspark.errors import PySparkException

    from qa_data_pipeline_rag_llm_spark.operators.cumulative import (
        rank_cumsum_multi,
    )

    df = spark.range(0, 50, 1, 1).select(
        "id",
        F.when(F.col("id") != 3, (F.col("id") * 37) % 101 + 1).alias("v"),
    )
    with pytest.raises(PySparkException, match="must be non-null"):
        rank_cumsum_multi(
            df, [F.col("v"), F.col("id")], ["v"], bucket_col="v"
        ).collect()


def test_rank_cumsum_multi_property_random_frames(spark):
    """Same hypothesis-style sweep for the multi-column variant: every
    random shape's ranks AND both running sums must match the naive
    single-window reference, at hostile bucket counts."""
    import random

    from pyspark.sql import Window as W

    from qa_data_pipeline_rag_llm_spark.operators.cumulative import (
        rank_cumsum_multi,
    )

    rng = random.Random(7)
    for trial in range(6):
        n = rng.choice([1, 2, 17, 251, 1024])
        heavy = rng.random() < 0.5
        rows = [
            (
                i,
                rng.choice([1, 1, 1, 7]) if heavy else rng.randint(-500, 500),
                rng.randint(-9, 9),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id long, v long, u long")
        got = rank_cumsum_multi(
            df,
            [F.col("v"), F.col("id")],
            ["v", "u"],
            bucket_col="v",
            num_buckets=rng.choice([1, 2, 8, 64]),
        ).select("id", "rank", "cum_v", "cum_u")
        w = W.orderBy("v", "id")
        wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
        want = df.select(
            "id",
            F.row_number().over(w).alias("rank"),
            F.sum("v").over(wc).alias("cum_v"),
            F.sum("u").over(wc).alias("cum_u"),
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), f"trial {trial} n={n} heavy={heavy}"
