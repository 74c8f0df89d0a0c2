"""bench.py artifact arithmetic — the pure pieces, no Spark session.

The bench's measurement loop needs a live engine; its ARTIFACT logic
does not. These pin the advice-r07 fixes: the drift fallback must leave
headline and ancillary fields mutually consistent, and the noise gate's
threshold semantics (mean/min > 1.4) must match what run_once records.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).parents[1] / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def test_drift_fallback_rebases_sched_adjusted():
    b = _bench()
    art = {
        "value": 10.0,  # median total
        "value_min": 9.0,
        "value_sched_adjusted": 9.6,  # median minus 0.4 sched excess
    }
    out = b.apply_drift_fallback(art)
    assert out["value"] == 9.0
    assert out["value_median"] == 10.0
    assert out["headline_is_min_due_to_drift"] is True
    # the SAME 0.4 excess now subtracts from the min total
    assert out["value_sched_adjusted"] == 8.6


def test_drift_fallback_noop_excess():
    b = _bench()
    # probe under anchor -> sched_excess 0 -> adjusted tracks the headline
    art = {"value": 5.0, "value_min": 4.5, "value_sched_adjusted": 5.0}
    out = b.apply_drift_fallback(art)
    assert out["value_sched_adjusted"] == out["value"] == 4.5


def test_noise_gate_threshold_semantics():
    # mirror of run_once's inline computation, pinned as the contract:
    # flagged iff median/min > 1.4; gated total substitutes min for
    # flagged queries only
    timings = {"a": 1.4, "b": 0.5, "c": 2.0}
    minima = {"a": 1.0, "b": 0.49, "c": 1.0}
    noisy = sorted(
        n for n in timings if minima[n] > 0 and timings[n] / minima[n] > 1.4
    )
    gated = round(
        sum(minima[n] if n in noisy else timings[n] for n in timings), 3
    )
    assert noisy == ["c"]  # a is exactly 1.4x -> NOT flagged; c is 2.0x
    assert gated == 1.4 + 0.5 + 1.0
