"""Snapshot every registry query's (source, oracle) fingerprint into
FINGERPRINTS.json keyed by round number.

The recheck rotation (plans/queries.py `_drop_stale_verifications`) uses
these snapshots to return a rewritten query to verification debt: a
clean CORRECTNESS row only certifies the fingerprint that was current
when the driver ran (VERDICT r05 ask #2). Run once per round after the
last query edit; `tests/test_recheck_rotation.py` pins that the latest
snapshot matches the working tree, so a post-snapshot edit turns the
suite red until this is re-run.

Usage: python tools/fingerprint_snapshot.py [--round N]
(default round = number of CORRECTNESS artifacts + 1 — the round the
driver will stamp next).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from qa_data_pipeline_rag_llm_spark.plans.queries import (  # noqa: E402
    REGISTRY,
    _load_artifacts,
    query_fingerprint,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--out", default=str(ROOT / "FINGERPRINTS.json"))
    args = ap.parse_args()
    rnd = args.round if args.round is not None else len(_load_artifacts()) + 1
    fps = {n: query_fingerprint(s) for n, s in REGISTRY.items()}
    path = Path(args.out)
    ledger = json.loads(path.read_text()) if path.exists() else {}
    ledger[str(rnd)] = fps
    path.write_text(json.dumps(ledger, indent=1, sort_keys=True) + "\n")
    print(f"snapshot round {rnd}: {len(fps)} fingerprints -> {path.name}")


if __name__ == "__main__":
    main()
