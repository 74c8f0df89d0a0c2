"""Recheck-rotation policy (VERDICT r04 #6): slots ADVANCE, not repeat.

Pure tests over the ordering kernel (`_ordered_names`) and the artifact
folding (`_verified_rounds`) — synthetic artifacts, no Spark, no disk.
"""

from __future__ import annotations

from qa_data_pipeline_rag_llm_spark.plans.queries import (
    DEBT_SLOTS,
    RECHECKS,
    _RECHECK_FROM_ARTIFACTS,
    _ordered_names,
    _verified_rounds,
)

CLEAN = {"err": None, "hash_match": True, "rows_match": True, "schema_match": True}
FAILED = {"err": "boom", "hash_match": None, "rows_match": None, "schema_match": None}


def _names(n: int) -> list[str]:
    return [f"q{i:03d}" for i in range(n)]


def test_last_clean_round_wins():
    arts = [{"a": CLEAN}, {}, {"a": CLEAN, "b": CLEAN}]
    rounds = _verified_rounds(arts)
    assert rounds == {"a": 2, "b": 2}


def test_failure_after_clean_returns_to_debt():
    arts = [{"a": CLEAN}, {"a": FAILED}]
    assert _verified_rounds(arts) == {}
    # ...and a later clean row re-verifies it
    arts.append({"a": CLEAN})
    assert _verified_rounds(arts) == {"a": 2}


def test_failed_only_rows_stay_debt():
    assert _verified_rounds([{"a": FAILED}]) == {}


def test_recheck_sets_disjoint_across_rounds():
    """Simulate the driver loop: each round samples the 50-query prefix
    (40 debt + 10 rechecks), records clean rows, reorders. Consecutive
    rounds must recheck DIFFERENT queries while enough verified queries
    exist to fill disjoint slots."""
    names = _names(120)
    oracled = set(names)
    # seed: everything verified across early rounds, debt exhausted —
    # the regime VERDICT r04 #6 worries about (post-debt steady state)
    arts: list[dict] = []
    for start in range(0, 120, 40):
        arts.append({n: CLEAN for n in names[start : start + 40]})
    while len(arts) < _RECHECK_FROM_ARTIFACTS:
        arts.append({})

    recheck_sets = []
    for _ in range(3):  # three simulated driver rounds
        rounds = _verified_rounds(arts)
        ordered = _ordered_names(names, rounds, len(arts), oracled)
        debt = [n for n in ordered if n not in rounds][:DEBT_SLOTS]
        prefix = ordered[: len(debt) + RECHECKS]
        rechecks = [n for n in prefix if n in rounds]
        assert len(rechecks) == RECHECKS
        recheck_sets.append(set(rechecks))
        # the driver records clean rows for the sampled prefix
        arts.append({n: CLEAN for n in prefix})

    assert recheck_sets[0].isdisjoint(recheck_sets[1])
    assert recheck_sets[1].isdisjoint(recheck_sets[2])


def test_debt_fills_before_rechecks():
    names = _names(60)
    oracled = set(names)
    arts: list[dict] = [{n: CLEAN for n in names[:10]}]
    while len(arts) < _RECHECK_FROM_ARTIFACTS:
        arts.append({})
    rounds = _verified_rounds(arts)
    ordered = _ordered_names(names, rounds, len(arts), oracled)
    # 50 debt > DEBT_SLOTS: first DEBT_SLOTS entries are all unverified
    assert all(n not in rounds for n in ordered[:DEBT_SLOTS])
    # then the rechecks
    assert all(n in rounds for n in ordered[DEBT_SLOTS : DEBT_SLOTS + RECHECKS])
