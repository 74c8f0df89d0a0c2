"""operators/cumulative.rank_cumsum: distributed global rank + running sum.

Parity against the naive single-task window (the thing it replaces), plus
determinism across repeated executions — the pattern's one correctness
subtlety is that both plan branches must observe the SAME range-partition
assignment (ReuseExchange); a mismatch would show up here as offset
drift.
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
        rank_cumsum(df, [F.desc("v"), F.col("id")], "v")
        .select("id", "rank", "cumsum")
        .collect()
    )
    want = _naive(df).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_rank_cumsum_deterministic_across_runs(spark):
    df = _frame(spark, n=3000)
    res = rank_cumsum(df, [F.desc("v"), F.col("id")], "v").select(
        "id", "rank", "cumsum"
    )
    a = sorted(map(tuple, res.collect()))
    b = sorted(map(tuple, res.collect()))
    assert a == b


def test_rank_cumsum_rank_is_dense_total_order(spark):
    df = _frame(spark, n=1000)
    rows = rank_cumsum(df, [F.desc("v"), F.col("id")], "v").collect()
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    # running sum at the max rank equals the exact total
    total = df.agg(F.sum("v")).collect()[0][0]
    last = max(rows, key=lambda r: r["rank"])
    assert last["cumsum"] == total


def test_rank_cumsum_more_partitions_than_rows(spark):
    df = _frame(spark, n=7)
    got = rank_cumsum(
        df, [F.desc("v"), F.col("id")], "v", num_partitions=32
    ).collect()
    want = _naive(df).collect()
    assert sorted((r["id"], r["rank"], r["cumsum"]) for r in got) == sorted(
        map(tuple, want)
    )
