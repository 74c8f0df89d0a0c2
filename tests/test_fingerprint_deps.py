"""Transitive dependency fingerprinting (VERDICT r06 ask #2).

v1 fingerprints hashed only the builder's source + oracle text, so a
rewrite of a shared engine helper (operators/dedup.py, functions/text.py)
left every dependent query's driver green standing. v2 folds in every
package function/class/module/constant the builder reaches. These tests
pin: the reachability walk finds real operator deps; an on-disk edit of a
dep module changes the fingerprint; constant edits change it; nested
lambdas' names are seen; and the ledger migration compares v1-format
snapshots on the v1 prefix only.
"""

from __future__ import annotations

import importlib.util
import linecache
import sys
import textwrap

import pytest

from qa_data_pipeline_rag_llm_spark.plans import queries as Q


# --------------------------------------------------------------------------
# _fp_matches: ledger migration semantics


def test_fp_matches_v1_snapshot_compares_prefix_only():
    assert Q._fp_matches("abcd1234abcd1234", "abcd1234abcd1234.deadbeef")
    assert not Q._fp_matches("ffff1234abcd1234", "abcd1234abcd1234.deadbeef")


def test_fp_matches_v2_snapshot_compares_full():
    assert Q._fp_matches("a.1", "a.1")
    # same builder+oracle, different deps -> stale under a v2 snapshot
    assert not Q._fp_matches("a.1", "a.2")


def test_fp_matches_absent_snapshot_trusts_row():
    assert Q._fp_matches(None, "anything.atall")


# --------------------------------------------------------------------------
# Reachability over the real registry


def test_dedup_query_depends_on_operator_module():
    deps: dict[str, str] = {}
    Q._dep_items(Q.REGISTRY["minhash_near_dups"].spark, set(), deps)
    assert any(
        "operators.dedup" in k for k in deps
    ), f"no operators.dedup dep found in {sorted(deps)[:20]}"


def test_q1_depends_on_limb_helpers_and_scale_constant():
    deps: dict[str, str] = {}
    Q._dep_items(Q.REGISTRY["q1_pricing_summary"].spark, set(), deps)
    keys = set(deps)
    assert any(k.endswith(".s_sumd") for k in keys)
    assert any(k.endswith(".s_limb_sum_int") for k in keys), (
        "helper-chain recursion (s_sumd -> s_limb_sum_int) missing: "
        f"{sorted(keys)}"
    )
    assert "const:SCALE" in keys or any("SCALE" in k for k in keys)


def test_every_registry_fingerprint_is_v2_and_deterministic():
    for name, spec in list(Q.REGISTRY.items())[:25]:
        fp = Q.query_fingerprint(spec)
        assert "." in fp, f"{name} fingerprint lacks dep suffix: {fp}"
    # recomputation (cached and uncached) is stable
    spec = Q.REGISTRY["q1_pricing_summary"]
    fp1 = Q.query_fingerprint(spec)
    Q._DEP_HASH_CACHE.pop(spec.spark, None)
    assert Q.query_fingerprint(spec) == fp1


def test_nested_lambda_names_are_seen():
    def outer():
        return [x for x in (lambda: some_helper_name)()]  # noqa: F821

    names = Q._code_names(outer.__code__)
    assert "some_helper_name" in names


# --------------------------------------------------------------------------
# On-disk dep edit invalidates the fingerprint (the ask's "Done" test)

_DEP_V1 = """
THRESHOLD = 5

def helper(x):
    return x + 1
"""

_DEP_V2 = """
THRESHOLD = 5

def helper(x):
    return x + 2  # behavior change
"""

_DEP_V3 = """
THRESHOLD = 9  # constant change only

def helper(x):
    return x + 1
"""


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _builder_using(mod):
    """A builder whose code references the dep module's helper and
    constant through its globals — the shape _dep_items walks."""
    src = textwrap.dedent(
        """
        def fake_builder(spark, sf_dir):
            return helper(THRESHOLD)
        """
    )
    gl = {"helper": mod.helper, "THRESHOLD": mod.THRESHOLD}
    exec(compile(src, "<fake_builder>", "exec"), gl)
    return gl["fake_builder"]


@pytest.fixture()
def dep_module(tmp_path, monkeypatch):
    """A throwaway on-disk module whose name matches the package prefix
    filter, plus cache hygiene so re-reads see fresh source."""
    path = tmp_path / "fpdep_mod.py"

    def write_and_load(src):
        path.write_text(src)
        linecache.clearcache()
        Q._MODULE_FILE_HASH_CACHE.clear()
        return _load_module(str(path), "fpdep_mod")

    monkeypatch.setattr(Q, "_PKG_PREFIX", "fpdep_mod")
    yield write_and_load
    sys.modules.pop("fpdep_mod", None)
    Q._MODULE_FILE_HASH_CACHE.clear()


def test_editing_dep_function_changes_dep_hash(dep_module):
    # hash eagerly after each load: getsource reads the CURRENT file, so
    # a later overwrite of the same path would alias both versions
    h1 = Q.query_dep_hash(_builder_using(dep_module(_DEP_V1)))
    h2 = Q.query_dep_hash(_builder_using(dep_module(_DEP_V2)))
    assert h1 != h2, "helper body edit did not invalidate the dep hash"


def test_editing_dep_constant_changes_dep_hash(dep_module):
    h1 = Q.query_dep_hash(_builder_using(dep_module(_DEP_V1)))
    h3 = Q.query_dep_hash(_builder_using(dep_module(_DEP_V3)))
    assert h1 != h3


def test_unchanged_dep_keeps_dep_hash(dep_module):
    h1 = Q.query_dep_hash(_builder_using(dep_module(_DEP_V1)))
    h1b = Q.query_dep_hash(_builder_using(dep_module(_DEP_V1)))
    assert h1 == h1b


def test_operator_edit_returns_dependent_query_to_stale(dep_module):
    """End-to-end: a clean row certified under the v2 snapshot goes stale
    when a dep module is edited — the transitive blind spot is closed."""
    fn1 = _builder_using(dep_module(_DEP_V1))
    spec1 = Q.QuerySpec("fake", fn1, "SELECT 1 AS x")
    fp_at_clean_row = Q.query_fingerprint(spec1)

    fn2 = _builder_using(dep_module(_DEP_V2))
    spec2 = Q.QuerySpec("fake", fn2, "SELECT 1 AS x")
    fp_now = Q.query_fingerprint(spec2)

    rounds = {"fake": 6}  # clean row in round 7 artifact (0-indexed 6)
    ledger = {"7": {"fake": fp_at_clean_row}}
    kept = Q._drop_stale_verifications(rounds, ledger, {"fake": fp_now})
    assert kept == {}, "dep edit should have returned the query to debt"
    # and with the dep unchanged it stays verified
    kept_same = Q._drop_stale_verifications(
        rounds, ledger, {"fake": fp_at_clean_row}
    )
    assert kept_same == rounds


# --------------------------------------------------------------------------
# Rewrite-recency ordering (VERDICT r06 ask #1)


def test_rewrite_rounds_reports_latest_mismatch():
    ledger = {
        "4": {"a": "old", "b": "same"},
        "5": {"a": "old", "b": "same"},
        "6": {"a": "new.1", "b": "same"},
    }
    current = {"a": "new.2", "b": "same"}
    rw = Q._rewrite_rounds(ledger, current)
    assert rw == {"a": 6}


def test_stale_ordering_most_recent_rewrite_first():
    names = [f"q{i}" for i in range(8)]
    rounds = {n: 0 for n in names}
    stale = frozenset(names[:4])
    rewritten = {"q0": 2, "q1": 6, "q2": 4, "q3": 6}
    ordered = Q._ordered_names(
        names,
        rounds,
        Q._RECHECK_FROM_ARTIFACTS,
        set(names),
        stale,
        rewritten,
    )
    head = ordered[:4]
    assert set(head) == set(stale)
    assert [rewritten[n] for n in head] == sorted(
        (rewritten[n] for n in head), reverse=True
    )


def test_const_repr_rejects_address_bearing_values():
    assert Q._const_repr(object()) is None
    assert Q._const_repr({"k": 1}) is None  # dicts excluded by design
    assert Q._const_repr(("a", 1, 2.0)) == "('a',1,2.0)"


# --------------------------------------------------------------------------
# Qualified constant keys + attr-restricted module resolution (advice r07)


def _exec_fn(src, gl, name="fake_builder"):
    exec(compile(textwrap.dedent(src), f"<{name}>", "exec"), gl)
    return gl[name]


def test_same_named_constants_in_two_modules_get_distinct_keys(
    tmp_path, monkeypatch
):
    """Two modules each define LIMIT; a builder reaching both must record
    two const entries — the unqualified `const:LIMIT` key let the later
    write shadow the earlier, so an edit to the shadowed constant kept a
    stale verification valid (advice r07)."""
    monkeypatch.setattr(Q, "_PKG_PREFIX", "fpdep2")
    (tmp_path / "fpdep2_b.py").write_text(
        "LIMIT = 3\n\ndef helper_b():\n    return LIMIT\n"
    )
    mod_b = _load_module(str(tmp_path / "fpdep2_b.py"), "fpdep2_b")
    try:
        fn = _exec_fn(
            """
            def fake_builder(spark, sf_dir):
                return LIMIT + helper_b()
            """,
            {"__name__": "fpdep2_a", "LIMIT": 9, "helper_b": mod_b.helper_b},
        )
        deps: dict[str, str] = {}
        Q._dep_items(fn, set(), deps)
        assert "const:fpdep2_a.LIMIT" in deps, sorted(deps)
        assert "const:fpdep2_b.LIMIT" in deps, sorted(deps)
        assert deps["const:fpdep2_a.LIMIT"] != deps["const:fpdep2_b.LIMIT"]
    finally:
        sys.modules.pop("fpdep2_b", None)


def test_code_import_from_sees_function_local_froms():
    def f():
        from os.path import join  # noqa: F401

        def g():
            from json import dumps  # noqa: F401

        return g

    by_mod = Q._code_import_from_by_mod(f.__code__)
    # nested code objects walked too, each name attributed to ITS module
    assert by_mod.get("os.path") == {"join"}
    assert by_mod.get("json") == {"dumps"}


def test_import_from_names_attributed_to_their_module(
    tmp_path, monkeypatch
):
    """``from json import dumps`` must not getattr-probe "dumps" against
    a local package module that coincidentally exposes one (advice r08:
    the IMPORT_FROM name belongs to the module named by its preceding
    IMPORT_NAME, and folding a stranger module's same-named attribute
    into the dep hash churns fingerprints on unrelated edits)."""
    monkeypatch.setattr(Q, "_PKG_PREFIX", "fpdep5")
    (tmp_path / "fpdep5_mod.py").write_text(
        "def dumps(x):\n    return x\n\ndef wanted(x):\n    return x\n"
    )
    mod = _load_module(str(tmp_path / "fpdep5_mod.py"), "fpdep5_mod")
    try:
        fn = _exec_fn(
            """
            def fake_builder(spark, sf_dir):
                from json import dumps

                m.wanted(1)
                return dumps({})
            """,
            {"__name__": "fpdep5_caller", "m": mod},
        )
        deps: dict[str, str] = {}
        Q._dep_items(fn, set(), deps)
        assert "fn:fpdep5_mod.wanted" in deps, sorted(deps)
        # the stdlib from-import's name never probes the package module
        assert not any(k.endswith(".dumps") for k in deps), sorted(deps)
        # and attribution still counts as a hit — no whole-file pin
        assert "mod:fpdep5_mod" not in deps
    finally:
        sys.modules.pop("fpdep5_mod", None)


def test_code_attr_pairs_sees_method_and_plain_attr_loads():
    def f(df):
        df.filter(1)  # LOAD_METHOD-style call on py3.11
        return [m.estimate for _ in range(1)]  # noqa: F821 — plain LOAD_ATTR

    pairs = Q._code_attr_pairs(f.__code__)
    assert ("df", "filter") in pairs
    assert ("m", "estimate") in pairs  # inside the comprehension's code


def test_method_names_not_resolved_against_local_modules(
    tmp_path, monkeypatch
):
    """`df.filter(...)`'s attribute name must not fold a coincidentally
    same-named attribute of an imported package module into the dep hash
    (advice r07: spurious fingerprint churn re-debts verified rows);
    attributes accessed ON the module alias still resolve at function
    granularity."""
    monkeypatch.setattr(Q, "_PKG_PREFIX", "fpdep3")
    (tmp_path / "fpdep3_mod.py").write_text(
        "def filter(x):\n    return x\n\ndef wanted(x):\n    return x\n"
    )
    mod = _load_module(str(tmp_path / "fpdep3_mod.py"), "fpdep3_mod")
    try:
        fn = _exec_fn(
            """
            def fake_builder(spark, sf_dir):
                m.wanted(1)
                return df.filter(2)
            """,
            {"__name__": "fpdep3_caller", "m": mod, "df": None},
        )
        deps: dict[str, str] = {}
        Q._dep_items(fn, set(), deps)
        assert "fn:fpdep3_mod.wanted" in deps, sorted(deps)
        assert not any(k.endswith(".filter") for k in deps), sorted(deps)
        # and the module did NOT degrade to a whole-file pin
        assert "mod:fpdep3_mod" not in deps
    finally:
        sys.modules.pop("fpdep3_mod", None)
