"""Grouped-map boundary floor, adjudicated once (VERDICT r12 ask #6).

Measures at $SPARK_GRAFT_SF_DIR (default sf0.1), warm, min-of-N:
  1. a TRIVIAL applyInPandas per-group fn (count only)   — the pandas floor
  2. the same trivial fn via applyInArrow (Spark 4)      — the arrow floor
  3. the registered fitted logic (_fit_trend)            — floor + real work
  4. trivial cogroup().applyInPandas vs .applyInArrow    — two-sided floors

The registered queries stay on the pandas surface (they exist to
exercise it); this records what the alternative API would buy so the
flag stops consuming probe budget. Results go to SCALING.md as a
permanent entry.

Usage: python tools/ab_grouped_floor.py [--runs=3]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402

from qa_data_pipeline_rag_llm_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def trivial_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {"user_id": [int(pdf["user_id"].iloc[0])], "n": [len(pdf)]}
    )


def trivial_arrow(tbl: pa.Table) -> pa.Table:
    return pa.table(
        {
            "user_id": pa.array(
                [tbl.column("user_id")[0].as_py()], pa.int64()
            ),
            "n": pa.array([tbl.num_rows], pa.int64()),
        }
    )


def trivial_co_pandas(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    uid = int(
        (left if len(left) else right)["user_id"].iloc[0]
    )
    return pd.DataFrame(
        {"user_id": [uid], "nl": [len(left)], "nr": [len(right)]}
    )


def trivial_co_arrow(left: pa.Table, right: pa.Table) -> pa.Table:
    src = left if left.num_rows else right
    uid = src.column("user_id")[0].as_py()
    return pa.table(
        {
            "user_id": pa.array([uid], pa.int64()),
            "nl": pa.array([left.num_rows], pa.int64()),
            "nr": pa.array([right.num_rows], pa.int64()),
        }
    )


def main() -> None:
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    spark = get_spark(app_name="ab_grouped_floor")
    spark.sparkContext.setLogLevel("ERROR")
    from qa_data_pipeline_rag_llm_spark.catalog import load_table
    from qa_data_pipeline_rag_llm_spark.operators.grouped import (
        _fit_trend,
        _TREND_DDL,
    )

    ev = load_table(spark, SF_DIR, "events")
    base = ev.select("user_id", "ts", "value")
    n_groups = base.select("user_id").distinct().count()
    print(f"groups: {n_groups}", flush=True)
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts")
    purch = ev.filter("event_type = 'purchase'").select("user_id", "ts")

    cases = {
        "grouped trivial applyInPandas": lambda: base.groupBy("user_id")
        .applyInPandas(trivial_pandas, "user_id bigint, n bigint"),
        "grouped trivial applyInArrow": lambda: base.groupBy("user_id")
        .applyInArrow(trivial_arrow, "user_id bigint, n bigint"),
        "grouped fitted applyInPandas": lambda: base.groupBy("user_id")
        .applyInPandas(_fit_trend, _TREND_DDL),
        "cogroup trivial applyInPandas": lambda: clicks.groupBy("user_id")
        .cogroup(purch.groupBy("user_id"))
        .applyInPandas(
            trivial_co_pandas, "user_id bigint, nl bigint, nr bigint"
        ),
        "cogroup trivial applyInArrow": lambda: clicks.groupBy("user_id")
        .cogroup(purch.groupBy("user_id"))
        .applyInArrow(
            trivial_co_arrow, "user_id bigint, nl bigint, nr bigint"
        ),
    }
    for name, make in cases.items():
        ts = []
        for i in range(runs + 1):  # first run warms the worker path
            t0 = time.perf_counter()
            make().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i:
                ts.append(dt)
        print(
            f"{name}: min={min(ts):.3f} runs="
            + ",".join(f"{t:.3f}" for t in ts),
            flush=True,
        )


if __name__ == "__main__":
    main()
