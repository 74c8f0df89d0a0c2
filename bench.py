"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with a count-style action (collect on the already
small/aggregated results) after a warm-up of the input scans; timings are
wall-clock per query, metric = total.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from qa_data_pipeline_rag_llm_spark.catalog import load_all  # noqa: E402
from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY  # noqa: E402
from qa_data_pipeline_rag_llm_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM + file-system caches so per-query numbers measure the
    # plans, not first-touch costs.
    for df in load_all(spark, sf_dir, register_views=False).values():
        df.count()

    bench_names = [n for n, s in REGISTRY.items() if s.bench]
    timings: dict[str, float] = {}
    for name in bench_names:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        rows = spec.spark(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert rows is not None
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
