"""A/B harness for the r10 `queries_udtf_sketch` family regression.

BENCH_r10 flagged the family at 4.28x vs r9 (sweep-wide regime 1.34x),
concentrated in the stream-stream joins. VERDICT r10 ask #2: adjudicate
HEAD vs HEAD-with-`ensure_protobuf`-disabled vs 1590c8c^ (pre-tws) on
the four suspect queries at sf0.1, same host, fresh JVM per mode.

Usage:  python tools/ab_streaming_regression.py <mode> [sf_dir]
  mode = head | noproto | <anything>  (the label stamped on the output;
         'noproto' additionally blanks protobuf_compat.KNOWN_RUNTIME_DIRS
         before the session is built, so ensure_protobuf finds nothing
         and PYTHONPATH / the version-check escape hatch are never
         exported to workers)

Prints one JSON line: {"mode": ..., "queries": {name: median_sec}, ...}.
Run each mode as its own process — the JVM and worker env must be built
fresh under the mode's conditions.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "streaming_click_purchase_join",
    "streaming_user_type_profile",
    "streaming_click_purchase_left",
    "streaming_click_purchase_full",
)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "head"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    if mode == "noproto":
        from qa_data_pipeline_rag_llm_spark import protobuf_compat

        protobuf_compat.KNOWN_RUNTIME_DIRS = ()

    from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
    from qa_data_pipeline_rag_llm_spark.session import get_spark

    spark = get_spark(app_name=f"ab_streaming_{mode}")
    spark.sparkContext.setLogLevel("ERROR")

    try:
        import google.protobuf  # noqa: F401

        proto = True
    except ImportError:
        proto = False

    def run(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    timings = {}
    for name in QUERIES:
        if name not in REGISTRY:  # older checkouts may lack a query
            continue
        run(name)  # warm (codegen, file listing)
        samples = [run(name) for _ in range(3)]
        timings[name] = round(statistics.median(samples), 3)
        print(f"# {name} {timings[name]}", file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "mode": mode,
                "protobuf_importable": proto,
                "sf": sf_dir,
                "queries": timings,
                "total": round(sum(timings.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
