"""SCD2 family invariants, independent of the DuckDB oracle.

The oracle proves cross-engine value equality; these pin the *semantic*
contract of a type-2 history table — properties a consumer relies on
that a hash match alone would not explain if they ever broke:

  * versions are dense 1..n per key;
  * validity intervals tile time: valid_to == next version's valid_from,
    exactly one open (NULL) interval per key, and it is the last;
  * run compression is maximal: consecutive versions never share state;
  * the incremental merge (history + delta tail recompute) is row-equal
    to the batch build over the full log.
"""

from __future__ import annotations

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
from tests.conftest import SF_DIR


def _by_user(rows):
    users: dict[int, list] = {}
    for r in rows:
        users.setdefault(r.user_id, []).append(r)
    for vs in users.values():
        vs.sort(key=lambda r: r.version)
    return users


def test_scd2_versions_dense_and_tiling(spark):
    rows = REGISTRY["scd2_user_state_events"].spark(spark, SF_DIR).collect()
    users = _by_user(rows)
    assert users, "no SCD2 rows at all"
    for uid, vs in users.items():
        assert [r.version for r in vs] == list(range(1, len(vs) + 1)), uid
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to_us == b.valid_from_us, (uid, a.version)
            assert a.state != b.state, (uid, a.version)  # maximal runs
            assert not a.is_current
        assert vs[-1].valid_to_us is None and vs[-1].is_current, uid
        for r in vs[:-1]:
            # closed intervals are well-formed (equal bounds only when a
            # run starts and the next state change lands on the same µs)
            assert r.valid_from_us <= r.valid_to_us, (uid, r.version)


def test_incremental_scd2_merge_equals_batch_build(spark):
    batch = sorted(
        map(
            tuple,
            REGISTRY["scd2_user_state_events"]
            .spark(spark, SF_DIR)
            .collect(),
        )
    )
    merged = sorted(
        map(
            tuple,
            REGISTRY["incremental_scd2_merge_events"]
            .spark(spark, SF_DIR)
            .collect(),
        )
    )
    assert batch == merged


def test_pit_join_matches_exactly_the_covered_purchases(spark):
    from pyspark.sql import functions as F

    from qa_data_pipeline_rag_llm_spark.catalog import load_table

    rows = (
        REGISTRY["pit_state_at_purchase"].spark(spark, SF_DIR).collect()
    )
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids)), "a purchase matched >1 interval"

    ev = load_table(spark, SF_DIR, "events")
    purchases = {
        r.event_id: (r.user_id, r.us)
        for r in ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.unix_micros("ts").alias("us"))
        .collect()
    }
    first_np = {
        r.user_id: r.us
        for r in ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("us"))
        .collect()
    }
    assert set(ids) == set(purchases), "output must cover every purchase"
    # intervals tile time from the user's first non-purchase event on:
    # a purchase is matched (non-null state) iff it does not predate it
    for r in rows:
        uid, p_us = purchases[r.event_id]
        covered = uid in first_np and p_us >= first_np[uid]
        assert (r.state is not None) == covered, (r.event_id, uid)


def test_scd2_kernel_property_random_logs(spark):
    """Random-log sweep: the Spark kernel must match a pure-Python
    run-compression reference on ties, singletons, single-state users,
    and interleaved arrival order."""
    import random

    from pyspark.sql import functions as F

    from qa_data_pipeline_rag_llm_spark.plans.queries_temporal import (
        _scd2_versions,
    )

    rng = random.Random(7)
    # None is a real state: a key whose FIRST event is NULL must still
    # get version 1 (advice r03 — eqNullSafe(NULL, lag=NULL) used to
    # call it "unchanged" and emit version 0, breaking the dense-1..n
    # invariant and diverging from the streaming kernel)
    states = ["a", "b", "c", None]
    for trial in range(6):
        n_users = rng.choice([1, 3, 10])
        rows = []
        eid = 0
        for u in range(n_users):
            n_ev = rng.choice([1, 2, 9, 40])
            ts = rng.randint(0, 5)
            for _ in range(n_ev):
                # duplicate timestamps with ~30% probability → event_id
                # tie-break must decide the run order
                if rng.random() > 0.3:
                    ts += rng.randint(1, 100)
                rows.append((u, rng.choice(states), ts * 1_000_000, eid))
                eid += 1
        if trial == 5:
            # pinned edge: every user's log LEADS with a NULL state
            rows = [(u, None, 0, 10_000 + u) for u in range(n_users)] + [
                (u, s, max(us, 1), e) for u, s, us, e in rows
            ]
        rng.shuffle(rows)  # arrival order must not matter

        # pure-python reference: sort, run-compress
        want = []
        by_user: dict[int, list] = {}
        for u, s, us, e in rows:
            by_user.setdefault(u, []).append((us, e, s))
        for u, evs in by_user.items():
            evs.sort()
            runs = []
            for us, _e, s in evs:
                if not runs or runs[-1][0] != s:
                    runs.append([s, us])
            for i, (s, us) in enumerate(runs):
                nxt = runs[i + 1][1] if i + 1 < len(runs) else None
                want.append((u, i + 1, s, us, nxt))

        df = spark.createDataFrame(
            [(u, s, us, e) for u, s, us, e in rows],
            "user_id long, event_type string, us long, event_id long",
        ).select(
            "user_id",
            "event_type",
            F.timestamp_micros(F.col("us")).alias("ts"),
            "event_id",
        )
        got = [
            (r.user_id, r.version, r.state,
             r.valid_from_us, r.valid_to_us)
            for r in _scd2_versions(df)
            .select(
                "user_id",
                "version",
                "state",
                F.unix_micros("vfrom").alias("valid_from_us"),
                F.unix_micros("vto").alias("valid_to_us"),
            )
            .collect()
        ]
        assert sorted(got) == sorted(want), f"trial {trial}"


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self.exists = True
        self._v = v


def _run_kernel(state, chunks):
    import pandas as pd

    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        _update_scd2_versions,
    )

    def mk(rows):
        return pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
                "event_id": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
            }
        )

    (out,) = list(
        _update_scd2_versions((7,), iter([mk(c) for c in chunks]), state)
    )
    return [tuple(r) for r in out.itertuples(index=False)]


def test_stream_kernel_sorts_across_chunk_boundaries():
    """Arrow slices a group at arbitrary batch boundaries with arbitrary
    intra-group order — run-compression must sort the WHOLE buffered
    batch, not each chunk (review r03: per-chunk sort inverted
    intervals when a later chunk held an earlier event)."""
    state = _FakeState()
    # chunk 1 holds the LATER event; chunk 2 the earlier two
    out = _run_kernel(
        state,
        [
            [(7, 50, 3, "b")],
            [(7, 10, 1, "a"), (7, 30, 2, "a")],
        ],
    )
    assert out == [(7, 1, "a", 10, 50)]
    assert state.get == ("b", 2, 50)


def test_stream_kernel_null_state_is_a_real_state():
    """NULL event types must round-trip as NULL (the batch kernel's
    eqNullSafe semantics), never the string 'None'."""
    state = _FakeState()
    out = _run_kernel(
        state, [[(7, 10, 1, None), (7, 20, 2, None), (7, 30, 3, "a")]]
    )
    assert out == [(7, 1, None, 10, 30)]
    assert state.get == ("a", 2, 30)
    # and a NULL run after a named one closes the named one
    out2 = _run_kernel(state, [[(7, 40, 4, None)]])
    assert out2 == [(7, 2, "a", 30, 40)]
    assert state.get == (None, 3, 40)


def test_stream_kernel_rejects_late_cross_batch_events():
    import pytest

    state = _FakeState()
    _run_kernel(state, [[(7, 100, 1, "a")]])
    with pytest.raises(ValueError, match="late event"):
        _run_kernel(state, [[(7, 50, 2, "b")]])
