"""Streaming-family decade probe (VERDICT r09 ask #3).

The streaming registry family is the sweep's costliest, and its STATE
STORE growth had never been measured beyond sf0.1. This probe runs the
stateful streaming queries at increasing scale factors and reports,
per query and scale, what actually matters for a long-running cluster:

  * wall seconds and micro-batch count (AvailableNow drains the whole
    table through maxFilesPerTrigger-paced batches);
  * max/final state rows (``stateOperators[].numRowsTotal`` from the
    progress feed) — the number that must stay BOUNDED BY KEYS, not by
    input volume, or a 100 TB stream eventually evicts its state store;
  * state rows per input row — flat-or-falling across a decade means
    state is keyed (sessions/users), not accreting per event.

Capture is a StreamingQueryListener on the shared session, so no query
code changes: every registry streaming query runs through its normal
``run_to_completion`` path.

Usage: python tools/streaming_probe.py [--pace=N] [--only=a,b] <sf_dir> [...]
Prints one JSON line per (query, sf_dir). ``--pace=N`` drains each query
in maxFilesPerTrigger=N micro-batches via the paced_file_streams()
context manager (injected scope, not an env var — ADVICE r10), making
watermark eviction observable; paced output legitimately drops late
rows, so pacing exists ONLY here, never in correctness/bench runs.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY  # noqa: E402
from qa_data_pipeline_rag_llm_spark.session import get_spark  # noqa: E402

PROBE_QUERIES = [
    "streaming_session_windows",
    "streaming_session_windows_watermarked",
    "streaming_hll_users",
    "streaming_scd2_closed_versions",
    # the stream-stream join matrix (VERDICT r10 ask #4): the queries
    # whose state actually worries a 100 TB/day deployment — watermark +
    # time-range predicates must keep join state evictable
    "streaming_click_purchase_join",
    "streaming_click_purchase_left",
    "streaming_click_purchase_full",
]


class _Capture(StreamingQueryListener):
    """Collects per-batch input volume and state-operator totals."""

    def __init__(self) -> None:
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.batches.append(
            {
                "batch": p.batchId,
                "input_rows": p.numInputRows,
                "state_rows": [
                    op.numRowsTotal for op in p.stateOperators
                ],
                "state_mem": [
                    op.memoryUsedBytes for op in p.stateOperators
                ],
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def probe(spark, name: str, sf_dir: str) -> dict:
    cap = _Capture()
    spark.streams.addListener(cap)
    try:
        t0 = time.perf_counter()
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        # progress events arrive on a listener-bus thread; drain it
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    finally:
        spark.streams.removeListener(cap)
    stateful = [b for b in cap.batches if b["state_rows"]]
    total_in = sum(b["input_rows"] for b in cap.batches)
    max_state = max(
        (max(b["state_rows"]) for b in stateful), default=0
    )
    final_state = stateful[-1]["state_rows"] if stateful else []
    return {
        "query": name,
        "sf_dir": sf_dir,
        "wall_sec": round(wall, 2),
        "batches": len(cap.batches),
        "input_rows": total_in,
        "max_state_rows": max_state,
        "final_state_rows": final_state,
        "state_per_input": round(max_state / total_in, 6)
        if total_in
        else None,
    }


def main() -> None:
    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        paced_file_streams,
    )

    pace = next(
        (
            int(a.split("=", 1)[1])
            for a in sys.argv[1:]
            if a.startswith("--pace=")
        ),
        None,
    )
    only = next(
        (
            a.split("=", 1)[1].split(",")
            for a in sys.argv[1:]
            if a.startswith("--only=")
        ),
        None,
    )
    dirs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "/root/testdata/sf0.1"
    ]
    # probe-scale harness headroom: run_to_completion's memory sink
    # collects the final table; complete-mode outputs at sf>=10 exceed
    # the default 1g driver.maxResultSize (a finding in itself - the
    # complete-mode session twin is unbounded BY DESIGN; the
    # watermarked variant is the scale path)
    spark = get_spark(
        app_name="streaming_probe",
        extra_conf={"spark.driver.maxResultSize": "4g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import contextlib

    scope = paced_file_streams(pace) if pace else contextlib.nullcontext()
    with scope:
        for sf_dir in dirs:
            for name in PROBE_QUERIES:
                if only and name not in only:
                    continue
                try:
                    out = probe(spark, name, sf_dir)
                except Exception as exc:  # record and keep probing
                    out = {
                        "query": name,
                        "sf_dir": sf_dir,
                        "error": repr(exc)[:300],
                    }
                if pace:
                    out["pace"] = pace
                print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
