"""Staleness-impact report: which queries' driver evidence dies if you
edit a given module/function?

Fingerprint v2 (plans/queries.py `query_dep_hash`) makes every registry
query's transitive code reach explicit. This tool inverts that mapping so
an edit's verification cost is known BEFORE making it — e.g. touching
`operators/similarity.py` re-debts every verified retrieval query, while
touching an already-stale family is free.

Usage:
  python tools/impact_report.py                      # top shared deps
  python tools/impact_report.py operators.dedup      # who depends on it
  python tools/impact_report.py --query minhash_near_dups   # its deps
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from qa_data_pipeline_rag_llm_spark.plans.queries import (  # noqa: E402
    REGISTRY,
    _dep_items,
    _drop_stale_verifications,
    _load_artifacts,
    _load_fingerprint_ledger,
    _verified_rounds,
    query_fingerprint,
)


def _deps_by_query() -> dict[str, set[str]]:
    out: dict[str, set[str]] = {}
    for name, spec in REGISTRY.items():
        d: dict[str, str] = {}
        _dep_items(spec.spark, set(), d)
        out[name] = set(d)
    return out


def _status() -> tuple[set[str], set[str]]:
    """(verified-and-fingerprint-valid, stale) query names."""
    rounds = _verified_rounds(_load_artifacts())
    kept = _drop_stale_verifications(
        rounds,
        _load_fingerprint_ledger(),
        {n: query_fingerprint(s) for n, s in REGISTRY.items()},
    )
    return set(kept), set(rounds) - set(kept)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("target", nargs="?", help="module/function substring")
    ap.add_argument("--query", help="show one query's dep set instead")
    args = ap.parse_args()

    deps = _deps_by_query()
    valid, stale = _status()

    def tag(n: str) -> str:
        return "valid" if n in valid else ("STALE" if n in stale else "debt")

    if args.query:
        for k in sorted(deps.get(args.query, {"<unknown query>"})):
            print(k)
        return

    if args.target:
        hit = [n for n, ds in deps.items() if any(args.target in d for d in ds)]
        cost = sum(1 for n in hit if n in valid)
        print(
            f"{len(hit)} dependent queries; editing re-debts "
            f"{cost} currently-valid driver rows:"
        )
        for n in sorted(hit, key=lambda n: (tag(n) != "valid", n)):
            print(f"  {tag(n):>5}  {n}")
        return

    # default: the most shared dep units — the highest-blast-radius edits
    fan: dict[str, int] = defaultdict(int)
    for ds in deps.values():
        for d in ds:
            fan[d] += 1
    print("blast radius (dependents) of the most-shared dep units:")
    for d, c in sorted(fan.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {c:>4}  {d}")


if __name__ == "__main__":
    main()
