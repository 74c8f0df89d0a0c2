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


def test_regime_fields_normalize_headline():
    b = _bench()
    art = {"value": 11.4, "calibration_sec": 0.6, "sf": 0.1}
    prev = {"calibration_sec": 0.5, "sf": 0.1}
    out = b.regime_fields(art, prev, "BENCH_r08.json")
    assert out["prev_bench_artifact"] == "BENCH_r08.json"
    assert out["regime_ratio"] == 1.2  # this host 1.2x slower
    assert out["value_regime_normalized"] == 9.5  # 11.4 / 1.2
    # FASTER host (ratio < 1): one-directional — raw value stands, no
    # fabricated regression from dividing by a sub-1 ratio
    fast = b.regime_fields(
        {"value": 7.8, "calibration_sec": 0.4, "sf": 0.1}, prev
    )
    assert fast["regime_ratio"] == 0.8
    assert fast["value_regime_normalized"] == 7.8
    # no previous artifact -> untouched
    art2 = {"value": 5.0, "calibration_sec": 0.5}
    assert "regime_ratio" not in b.regime_fields(art2, None)


def test_regime_family_regressions_scale_by_host():
    b = _bench()
    # families: "a" doubled (real regression even after 1.2x host
    # normalization), "b" inflated exactly with the host (not flagged),
    # "c" new this round (no baseline -> not flagged)
    art = {
        "value": 1.0,
        "calibration_sec": 0.6,
        "sf": 0.1,
        "registry_families": {"a": 20.0, "b": 11.9, "c": 4.0},
    }
    prev = {
        "calibration_sec": 0.5,
        "sf": 0.1,
        "registry_families": {"a": 10.0, "b": 10.0},
    }
    out = b.regime_fields(art, prev)
    assert out["registry_family_regressions"] == ["a"]
    # different SF -> family comparison suppressed entirely
    art["sf"] = 0.01
    art.pop("registry_family_regressions", None)
    out = b.regime_fields(dict(art), prev)
    assert "registry_family_regressions" not in out


def test_regime_faster_host_not_inflating_family_threshold():
    b = _bench()
    # a FASTER host (ratio < 1) must not shrink the regression bar —
    # norm clamps at 1.0 so genuinely-faster rounds still flag a 1.4x
    # family blowup
    art = {
        "value": 1.0,
        "calibration_sec": 0.4,
        "sf": 0.1,
        "registry_families": {"a": 14.0},
    }
    prev = {
        "calibration_sec": 0.5,
        "sf": 0.1,
        "registry_families": {"a": 10.0},
    }
    out = b.regime_fields(art, prev)
    assert out["regime_ratio"] == 0.8
    assert out["registry_family_regressions"] == ["a"]


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
