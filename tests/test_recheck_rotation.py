"""Recheck-rotation policy (VERDICT r04 #6): slots ADVANCE, not repeat.

Pure tests over the ordering kernel (`_ordered_names`) and the artifact
folding (`_verified_rounds`) — synthetic artifacts, no Spark, no disk.
"""

from __future__ import annotations

from qa_data_pipeline_rag_llm_spark.plans.queries import (
    DEBT_SLOTS,
    RECHECKS,
    _RECHECK_FROM_ARTIFACTS,
    _drop_stale_verifications,
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


# --------------------------------------------------------------------------
# Change-aware rotation (VERDICT r05 ask #2): a clean row only certifies the
# (source, oracle) fingerprint that was current when the driver ran.


def test_fingerprint_change_returns_query_to_debt():
    rounds = {"a": 1, "b": 1}
    ledger = {"2": {"a": "fp_old", "b": "fp_same"}}
    current = {"a": "fp_new", "b": "fp_same"}
    kept = _drop_stale_verifications(rounds, ledger, current)
    assert kept == {"b": 1}


def test_missing_snapshot_degrades_to_trusting_the_row():
    # pre-ledger rounds (or a name absent from the snapshot) keep their
    # verification — absence of evidence is not a rewrite
    rounds = {"a": 0, "b": 3}
    ledger = {"4": {"b": "fp"}}
    current = {"a": "anything", "b": "fp"}
    assert _drop_stale_verifications(rounds, ledger, current) == rounds


def test_stale_queries_take_recheck_slots_not_debt_slots():
    """Never-rowed debt keeps all DEBT_SLOTS (the cumulative-coverage
    burn); stale queries lead the RECHECKS window."""
    names = _names(120)
    oracled = set(names)
    rounds = {n: 0 for n in names[:60]}  # 60 verified, 60 never-rowed
    stale = frozenset(names[50:60])  # ten of the verified went stale
    ordered = _ordered_names(
        names, rounds, _RECHECK_FROM_ARTIFACTS, oracled, stale
    )
    debt_slice = ordered[:DEBT_SLOTS]
    recheck_slice = ordered[DEBT_SLOTS : DEBT_SLOTS + RECHECKS]
    assert all(n not in rounds for n in debt_slice)
    assert set(recheck_slice) == set(stale)


def test_stale_ordering_oldest_clean_first_after_pins():
    names = _names(30)
    rounds = {n: i % 3 for i, n in enumerate(names)}  # clean rounds 0/1/2
    stale = frozenset(names)
    ordered = _ordered_names(names, rounds, _RECHECK_FROM_ARTIFACTS, set(names), stale)
    rechecks = ordered[:RECHECKS]  # no debt at all -> rechecks lead
    assert [rounds[n] for n in rechecks] == sorted(rounds[n] for n in rechecks)


def test_post_debt_regime_window_drains_remaining_stale():
    """The r8 regime (VERDICT r06 #1): once never-rowed debt hits zero,
    the driver's 50-query prefix must absorb EVERY remaining stale query
    plus the oldest verifications — no stale green should outlive the
    round after debt clears."""
    names = _names(100)
    rounds = {n: i % 5 for i, n in enumerate(names)}  # all verified
    stale = frozenset(names[40:57])  # 17 stale, like the real r8 start
    ordered = _ordered_names(
        names, rounds, _RECHECK_FROM_ARTIFACTS, set(names), stale
    )
    prefix = ordered[:50]
    assert set(stale) <= set(prefix), "a stale query missed the window"
    # the rest of the window is the oldest verifications
    rest = [n for n in prefix if n not in stale]
    cutoff = max(rounds[n] for n in rest)
    outside = [n for n in ordered[50:] if n not in stale]
    assert all(rounds[n] >= cutoff for n in outside)


def test_underfilled_debt_extends_recheck_queue_into_window():
    """The r7 regime: 36 debt + 31 stale must yield a 50-prefix of
    36 debt + 14 stale — the recheck queue extends past RECHECKS when
    debt underfills its slots (emergent from the interleave, pinned
    here so a refactor can't regress it)."""
    names = _names(120)
    rounds = {n: 0 for n in names[36:]}  # first 36 never rowed
    stale = frozenset(names[36:67])  # 31 stale
    ordered = _ordered_names(
        names, rounds, _RECHECK_FROM_ARTIFACTS, set(names), stale
    )
    prefix = ordered[:50]
    assert sum(1 for n in prefix if n not in rounds) == 36
    assert sum(1 for n in prefix if n in stale) == 14


def test_zero_debt_zero_stale_cycles_whole_registry_oldest_first():
    """VERDICT r07 ask #6: with debt AND stale at zero, the 50-query
    driver prefix must be the 50 oldest verifications — the constants
    must not strand the window at 10 rechecks/round (a ~28-round cycle
    over 279 queries). The interleave degenerates to all-done-sorted, so
    the registry re-rows on a ⌈N/50⌉ cycle."""
    names = _names(279)
    rounds = {n: i % 6 for i, n in enumerate(names)}  # all verified
    ordered = _ordered_names(
        names, rounds, _RECHECK_FROM_ARTIFACTS, set(names), frozenset()
    )
    ages = [rounds[n] for n in ordered]
    assert ages == sorted(ages), "window is not oldest-first"
    # every window slot is a productive recheck — nothing is reserved
    # for (empty) debt
    assert len(ordered[:50]) == 50
    assert all(n in rounds for n in ordered[:50])


def test_fingerprint_ledger_current_with_working_tree():
    """The latest FINGERPRINTS.json snapshot must match the working tree:
    editing a query after the snapshot turns this red until
    tools/fingerprint_snapshot.py is re-run — so the driver always tests
    code whose fingerprints the next rotation can trust."""
    import json
    import pathlib

    from qa_data_pipeline_rag_llm_spark.plans.queries import (
        REGISTRY,
        query_fingerprint,
    )

    path = pathlib.Path(__file__).parents[1] / "FINGERPRINTS.json"
    ledger = json.loads(path.read_text())
    latest = ledger[max(ledger, key=int)]
    current = {n: query_fingerprint(s) for n, s in REGISTRY.items()}
    changed = {
        n for n in set(latest) | set(current) if latest.get(n) != current.get(n)
    }
    assert not changed, (
        f"queries edited since the last fingerprint snapshot: {sorted(changed)} "
        "— run `python tools/fingerprint_snapshot.py`"
    )
