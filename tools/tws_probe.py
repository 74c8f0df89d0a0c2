"""Decade probe for the transformWithStateInPandas protocol cost
(VERDICT r11 ask #5).

For each probe scale this times the tws and applyInPandasWithState
implementations of ``stream_user_type_profile`` (interleaved, same
session, warm) and accounts the state-server round trips per micro-batch
analytically from the data: with the r12 batched protocol each user
costs 1 iterator drain + one updateValue per event type touched in the
batch (t+1 RPCs); the r11 per-type containsKey+getValue+updateValue
pattern cost 3t+1. RPC counts are exact functions of (n_users,
sum of per-user distinct types), both computed from the input.

Usage: python tools/tws_probe.py [sf_dir ...]   (default: sf0.1 + /tmp/probe/sf{1,10})
Prints one JSON line per scale plus a summary; paste into SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from qa_data_pipeline_rag_llm_spark.session import get_spark  # noqa: E402
from qa_data_pipeline_rag_llm_spark.catalog import load_table  # noqa: E402
from qa_data_pipeline_rag_llm_spark.streaming.events import (  # noqa: E402
    state_partitions_for_input,
    stream_user_type_profile,
)


def probe(spark, sf_dir: str, runs: int = 3) -> dict:
    ev = load_table(spark, sf_dir, "events")
    stats = (
        ev.groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("t"))
        .agg(
            F.count("*").alias("n_users"),
            F.sum("t").alias("sum_types"),
        )
        .collect()[0]
    )
    n_users, sum_types = int(stats["n_users"]), int(stats["sum_types"])
    out: dict = {
        "sf_dir": sf_dir,
        "n_users": n_users,
        "state_partitions": state_partitions_for_input(
            spark, sf_dir, tables=("events",)
        ),
        # single AvailableNow batch: every user's full type set arrives at once
        "rpc_per_batch_r11_protocol": 3 * sum_types + n_users,
        "rpc_per_batch_r12_batched": sum_types + n_users,
    }
    for impl in ("tws", "fallback"):
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            n = stream_user_type_profile(spark, sf_dir, impl=impl).count()
            times.append(round(time.perf_counter() - t0, 2))
        out[f"{impl}_sec"] = sorted(times)[len(times) // 2]
        out[f"{impl}_runs"] = times
        out[f"{impl}_rows"] = n
    out["tws_over_fallback"] = round(out["tws_sec"] / out["fallback_sec"], 2)
    return out


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/probe/sf1",
        "/tmp/probe/sf10",
    ]
    spark = get_spark(app_name="tws_probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for d in dirs:
        if not Path(d).exists():
            print(json.dumps({"sf_dir": d, "skipped": "missing"}))
            continue
        r = probe(spark, d)
        rows.append(r)
        print(json.dumps(r))
    if len(rows) >= 2:
        print(
            json.dumps(
                {
                    "summary_tws_over_fallback": [
                        r["tws_over_fallback"] for r in rows
                    ],
                    "summary_tws_sec": [r["tws_sec"] for r in rows],
                    "summary_fallback_sec": [r["fallback_sec"] for r in rows],
                }
            )
        )


if __name__ == "__main__":
    main()
