"""Property tests for the mergeable-summary hash algebra — no Spark.

The family's whole correctness story rests on both engines deriving the
SAME (bucket, w, rho) from md5. test_mergeable.py pins Spark == DuckDB;
these properties add the third, independent implementation (Python
hashlib + integer bit math) as the tie-breaker, over hypothesis-driven
key domains including negatives, zero, and 64-bit extremes.
"""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from qa_data_pipeline_rag_llm_spark.operators import hll


def _ref(key: str) -> tuple[int, int, int]:
    """hashlib reference: (bucket, w, rho) exactly as the SQL derives
    them — first 2 hex chars, next 15, rho = 61 - bitlength(w)."""
    hx = hashlib.md5(key.encode()).hexdigest()
    bucket = int(hx[:2], 16)
    w = int(hx[2:17], 16)
    rho = 61 if w == 0 else 61 - w.bit_length()
    return bucket, w, rho


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_duck_registers_match_hashlib(key: int):
    con = duckdb.connect()
    b, w, r = con.execute(
        f"""SELECT {hll.duck_bucket_sql("k")},
                   {hll.duck_w_sql("k")},
                   {hll.duck_rho_sql("k")}
            FROM (SELECT CAST(? AS BIGINT) AS k)""",
        [key],
    ).fetchone()
    assert (b, w, r) == _ref(str(key))


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=40))
def test_duck_string_key_registers_match_hashlib(key: str):
    # string keys feed the vocab-overlap query; NUL bytes can't cross
    # the SQL parameter boundary in a VARCHAR, hypothesis filters them
    if "\x00" in key:
        return
    con = duckdb.connect()
    b, w, r = con.execute(
        f"""SELECT {hll.duck_bucket_sql("k")},
                   {hll.duck_w_sql("k")},
                   {hll.duck_rho_sql("k")}
            FROM (SELECT CAST(? AS VARCHAR) AS k)""",
        [key],
    ).fetchone()
    assert (b, w, r) == _ref(key)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**6),
        min_size=1,
        max_size=400,
        unique=True,
    )
)
def test_hll_estimate_formula_matches_reference(keys: list[int]):
    """The full estimator (registers -> branch-selected estimate) in
    DuckDB must equal a from-scratch Python HLL over the same keys."""
    regs: dict[int, int] = {}
    for k in keys:
        b, _, r = _ref(str(k))
        regs[b] = max(regs.get(b, 0), r)
    v = hll.M - len(regs)
    s = sum(1 << (hll.RHO_MAX - m) for m in regs.values()) + v * hll.TWO61
    raw = float(hll.ALPHA_NUM) / float(s)
    import math

    expected = (
        hll.M * math.log(hll.M / v)
        if (v > 0 and raw <= hll.LC_CUTOFF)
        else raw
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ks AS SELECT unnest(?) AS k", [keys]
    )
    got = con.execute(
        f"""WITH regs AS (
              SELECT 1 AS g, {hll.duck_bucket_sql("k")} AS bucket,
                     MAX({hll.duck_rho_sql("k")}) AS m_reg
              FROM ks GROUP BY {hll.duck_bucket_sql("k")})
            {hll.duck_estimate_sql("regs", "g")}"""
    ).fetchone()[2]
    assert got == expected
