"""Cross-engine parity of the text/hash fragment contract on ADVERSARIAL
strings — the foundation ~50 oracles stand on.

The golden oracle tests only exercise the (pure-ASCII) testdata; this sweep
feeds the Spark helpers and their DuckDB fragment twins the inputs that
actually break Unicode-casing assumptions: Turkish İ/ı (JVM lower('İ') is
'i'+U+0307 while DuckDB folds to 'i' — the divergence that forced the
strip-before-lower contract, probed 2026-08-14), German ß/ẞ, combining
marks, CJK, emoji (non-BMP), control characters, NULL/empty/blank, and
random mixtures. Any new fragment must join this sweep.
"""

from __future__ import annotations

import math
import random

import pandas as pd
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.hashing import stable_int32
from qa_data_pipeline_rag_llm_spark.functions.text import (
    bpe_token_count,
    fingerprint,
    o_bpe_token_count,
    token_count,
    tokens,
    word_shingles,
)
from qa_data_pipeline_rag_llm_spark.plans import oracle_fragments as O

ALPHABETS = [
    "abc ",
    "ab12  -_.",
    "é漢字Ωİß ",
    "'\"\\%$#@!",
    "a\t\nb ",
    " ",
    "İıIiẞß",
    "😀🎉",
]

PINNED = [
    None,
    "",
    "     ",
    "x" * 500,
    "İstanbul Çile ĞÜ",   # Turkish special-casing
    "aİba İΩa",           # the original diverging shape
    "ẞharp ßeta STRASSE", # German sharp s
    "😀 emoji 🎉 test",    # non-BMP codepoints
    "étude café",  # combining acute
    "tab\tand\nnewline\r",
    "ALLCAPS MiXeD lower 0123",
]


def _corpus() -> list[tuple[int, str | None]]:
    rng = random.Random(7)
    rows = [
        (
            i,
            "".join(
                rng.choice(rng.choice(ALPHABETS))
                for _ in range(rng.randint(0, 40))
            ),
        )
        for i in range(300)
    ]
    rows += [(300 + i, t) for i, t in enumerate(PINNED)]
    return rows


def _eq(a, b) -> bool:
    def _null(x):
        return x is None or (isinstance(x, float) and math.isnan(x))

    if _null(a) or _null(b):  # pandas renders SQL NULL as None OR NaN
        return _null(a) and _null(b)
    if isinstance(a, str) or isinstance(b, str):
        return a == b
    if hasattr(a, "__len__") or hasattr(b, "__len__"):
        a_null = a is None or (isinstance(a, float) and math.isnan(a))
        b_null = b is None or (isinstance(b, float) and math.isnan(b))
        if a_null or b_null:
            return a_null and b_null
        return list(a) == list(b)
    if a is None or b is None:
        return a is b
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def test_fragment_parity_adversarial_strings(spark, duck):
    rows = _corpus()
    df = spark.createDataFrame(rows, "id long, text string")
    got = (
        df.select(
            "id",
            tokens("text").alias("toks"),
            token_count("text").alias("tc"),
            word_shingles("text", 3).alias("sh3"),
            word_shingles("text", 8).alias("sh8"),
            stable_int32(F.coalesce(F.col("text"), F.lit("<N>"))).alias("h"),
            fingerprint("text").alias("fp"),
            bpe_token_count("text").alias("bpe"),
        )
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    duck.register("_frag_t", pd.DataFrame(rows, columns=["id", "text"]))
    want = (
        duck.execute(
            f"""
            SELECT id,
                   {O.toks("text")} AS toks,
                   {O.token_count("text")} AS tc,
                   {O.shingles("text", 3)} AS sh3,
                   {O.shingles("text", 8)} AS sh8,
                   {O.stable_int32("coalesce(text, '<N>')")} AS h,
                   {O.fingerprint("text")} AS fp,
                   {o_bpe_token_count("text")} AS bpe
            FROM _frag_t
            """
        )
        .df()
        .set_index("id")
        .sort_index()
    )
    diverged = []
    for i in got.index:
        for c in ["toks", "tc", "sh3", "sh8", "h", "fp", "bpe"]:
            if not _eq(got.loc[i, c], want.loc[i, c]):
                diverged.append((int(i), c, rows[i][1], got.loc[i, c], want.loc[i, c]))
    assert not diverged, f"{len(diverged)} divergences, first: {diverged[:3]}"


def test_normalize_strips_before_lower(spark):
    """The İ contract itself: a special-casing letter is a DELIMITER, it
    never contributes a latin letter to a token."""
    df = spark.createDataFrame([(0, "aİba"), (1, "İİ"), (2, "AbC-Def")], "id long, text string")
    out = {r["id"]: r["t"] for r in df.select("id", tokens("text").alias("t")).collect()}
    assert out[0] == ["a", "ba"]
    assert out[1] == [""]  # nothing but delimiters → normalized empty
    assert out[2] == ["abc", "def"]


def test_avg4_integer_rounding_matches_decimal_half_up(duck):
    """ADVICE r05 (queries.py:170): q1's round(avg, 4) must be exact
    half-up on the true rational S/(SCALE·N) — including the .00005 tie
    boundaries where double rounding diverges across engines. The
    integer form r4 = (2S+N) div (2N) is checked against
    decimal.Decimal ROUND_HALF_UP on adversarial tie cases and random
    draws, and the DuckDB twin replays the same integer expression."""
    from decimal import ROUND_HALF_UP, Decimal

    from qa_data_pipeline_rag_llm_spark.plans.queries import SCALE

    rng = random.Random(6)
    cases = []
    # exact .00005 ties: S/(SCALE*N)*10^4 = m + 0.5  =>  2S = (2m+1)*N
    for n in (1, 3, 7, 1000, 999_983):
        for m in (0, 1, 249_999, 10**9):
            if ((2 * m + 1) * n) % 2 == 0:
                continue  # needs odd product to be a true half tie
            s = (2 * m + 1) * n  # 2S = (2m+1)N may be odd -> skip
            if s % 2:
                continue
            cases.append((s // 2, n))
    # near-tie neighbours and random draws
    for _ in range(500):
        n = rng.randint(1, 10**7)
        m = rng.randint(0, 10**8)
        base = (2 * m + 1) * n
        for delta in (-1, 0, 1):
            s2 = base + delta
            if s2 > 0 and s2 % 2 == 0:
                cases.append((s2 // 2, n))
        cases.append((rng.randint(1, 10**15), n))
    assert len(cases) > 500

    for s, n in cases:
        want = int(
            (Decimal(s) * 10**4 / (Decimal(SCALE) * n)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )
        got = (2 * s + n) // (2 * n)
        assert got == want, (s, n, got, want)

    # DuckDB replays the identical integer expression (HUGEINT path)
    rows = duck.execute(
        "SELECT (2*CAST(? AS HUGEINT) + ?) // (2*CAST(? AS HUGEINT))",
        [cases[0][0], cases[0][1], cases[0][1]],
    ).fetchone()
    assert rows[0] == (2 * cases[0][0] + cases[0][1]) // (2 * cases[0][1])


def test_sumd_limb_recombination_parity_beyond_2_53(spark, duck):
    """q1's r7 display contract (s_sumd/o_sumd): every sum_* column is
    round(CAST(S AS DOUBLE)/scale, 2) where S is the exact integer limb
    recombination — DECIMAL(38,0) in Spark, HUGEINT in DuckDB. Both
    engines must IEEE-round the SAME exact integer, so results are
    bit-identical even when S exceeds 2^53 (where the r6 double-
    polynomial recombination could diverge by an ulp). Random scaled
    longs up to 2^60 force 3-limb splits and >2^53 sums."""
    from qa_data_pipeline_rag_llm_spark.plans.queries import (
        SCALE,
        o_avg4,
        o_limb_sum_int,
        o_sumd,
        s_avg4,
        s_limb_sum_int,
        s_sumd,
    )

    rng = random.Random(7)
    vals = (
        [rng.randrange(0, 1 << 60) for _ in range(400)]
        + [0, 1, (1 << 60) - 1, (1 << 53) + 1, (1 << 23) - 1, 1 << 23]
        + [rng.randrange(0, SCALE * SCALE) for _ in range(100)]
    )
    total = sum(vals)
    assert total > (1 << 53)  # the regime double sums cannot represent

    sdf = spark.createDataFrame([(v,) for v in vals], "v long")
    got_spark = sdf.selectExpr(
        f"{s_sumd('v', SCALE, 3)} AS s",
        f"{s_avg4('v', 3)} AS a" if SCALE == 10_000 else "0.0 AS a",
        f"CAST({s_limb_sum_int('v', 3)} AS STRING) AS exact_s",
    ).collect()[0]
    duck.execute("CREATE OR REPLACE TABLE _sumd(v BIGINT)")
    duck.executemany("INSERT INTO _sumd VALUES (?)", [(v,) for v in vals])
    got_duck = duck.execute(
        f"SELECT {o_sumd('v', SCALE, 3)} AS s, {o_avg4('v', 3)} AS a, "
        f"CAST({o_limb_sum_int('v', 3)} AS VARCHAR) AS exact_s "
        "FROM _sumd"
    ).fetchone()

    # the recombined integer itself is exact and equal in both engines
    assert int(got_spark.exact_s) == total
    assert int(got_duck[2]) == total
    # displayed doubles bit-identical across engines
    assert repr(got_spark.s) == repr(got_duck[0]), (got_spark.s, got_duck[0])
    assert repr(got_spark.a) == repr(got_duck[1]), (got_spark.a, got_duck[1])
