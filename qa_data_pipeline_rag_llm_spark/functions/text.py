"""Text expressions: HTML strip, normalization, tokenization, quality, lang-ID.

The reference's only UDF is a row-at-a-time BeautifulSoup HTML stripper
(``/root/reference/STACK-Nettoyage-Posts.py:77-87``) that forces a
BatchEvalPython stage (SURVEY.md §4). Here the default path is pure SQL
(`regexp_replace`), fully codegen'd and oracle-checkable; tag-soup fidelity
beyond that is a documented divergence.

All heuristics (language ID, quality score) are deliberately expressible in
ANSI SQL so the DuckDB oracle can replay them bit-for-bit.
"""

from __future__ import annotations

import sys

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

cloudpickle.register_pickle_by_value(sys.modules[__name__])

# Matches tags and the handful of entities the reference corpus uses.
_TAG_RE = "<[^>]+>"

# Entity table shared by the SQL path and its DuckDB oracle twin
# (plans build the nested-replace SQL from this list — one source of
# truth). Ordering matters: the two ampersand spellings come LAST so
# double-encoded input like ``&amp;lt;`` decodes once, not twice.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&#x27;", "'"),  # hex apostrophe — common in real StackExchange HTML
    ("&apos;", "'"),
    ("&#34;", '"'),
    ("&nbsp;", " "),
    ("&#38;", "&"),
    ("&amp;", "&"),
]


def html_strip(col: Column | str) -> Column:
    """Strip HTML tags and unescape common entities, null-safe.

    SQL-expressible analogue of the reference's BS4 ``clean_html`` UDF
    (``STACK-Nettoyage-Posts.py:77-87``; the comments variant at
    ``STACK-Nettoyage-Comms.py:75-81`` is NOT null-safe — we are).
    Arbitrary numeric entities and tag-soup need the Arrow UDF variant
    (:func:`clean_html_bs4`); this path trades that fidelity for
    whole-stage codegen and an exact SQL oracle.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, _TAG_RE, "")
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def o_html_strip(expr: str) -> str:
    """DuckDB twin of :func:`html_strip` over a SQL expression, generated
    from the same HTML_ENTITIES table so the two can never drift."""
    out = f"regexp_replace({expr}, '<[^>]+>', '', 'g')"
    for ent, ch in HTML_ENTITIES:
        out = f"replace({out}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    return out


try:  # gated: BeautifulSoup is not in the base image (SURVEY §5 item 5)
    from bs4 import BeautifulSoup  # type: ignore

    _HAVE_BS4 = True
except ImportError:
    _HAVE_BS4 = False


def _extract_text_py(s: str | None) -> str | None:
    """Python-side HTML→text: BeautifulSoup ``get_text()`` when bs4 is
    importable, else a stdlib ``html.parser`` extraction — a REAL parser
    (handles numeric/hex/named entities, nesting, malformed tag-soup),
    not a stub. Divergences from the SQL path are documented in
    tests/test_text_html.py."""
    if s is None:
        return None
    if _HAVE_BS4:
        return BeautifulSoup(s, "html.parser").get_text()
    from html.parser import HTMLParser

    class _Extract(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []

        def handle_data(self, data: str) -> None:
            self.parts.append(data)

    p = _Extract()
    p.feed(s)
    p.close()
    return "".join(p.parts)


@F.pandas_udf(StringType())
def clean_html_bs4(s: pd.Series) -> pd.Series:
    """Arrow-batched HTML strip with full-parser semantics — the faithful
    twin of the reference's row-at-a-time BS4 UDF
    (``STACK-Nettoyage-Posts.py:77-87``), vectorized: one Arrow batch per
    call instead of one pickled row (the reference's BatchEvalPython
    bottleneck, SURVEY.md §4)."""
    return s.map(_extract_text_py)


def strip_id_prefix(col: Column | str, prefix: str = "t3_") -> Column:
    """Reddit fullname prefix strip (``REDDIT-Ingestion.py:76,127``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, f"^{prefix}", "")


def normalize_text(col: Column | str) -> Column:
    """Canonical text for fingerprinting/dedup: collapse runs of
    non-ASCII-alphanumerics to single spaces, THEN lowercase, trim.

    Strip-before-lower is the cross-engine contract: JVM lower() expands
    some special-casing letters into base + combining mark (U+0130 İ →
    'i' + U+0307) while DuckDB's lower() folds them to the bare base
    letter — lowering first therefore tokenizes 'aİb' differently per
    engine (probed 2026-08-14, tests/test_fragment_parity.py). Stripping
    first makes every non-ASCII codepoint a delimiter before any
    locale/Unicode casing can run, so both engines see identical ASCII
    input to lower().

    The class is written [\\W_] (ASCII \\w complement + underscore ==
    non-alphanumeric) rather than [^a-zA-Z0-9]: Java's Pattern has a
    fast path for \\W that a three-range negated class misses — the
    explicit class was 3x slower end-to-end on the shingle pipeline
    (minhash bench 0.8 s -> 17 s; probed 2026-08-14). RE2's \\W is the
    same ASCII complement, so the DuckDB twin is semantically identical."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.lower(F.regexp_replace(c, "[\\W_]+", " ")))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column | str) -> Column:
    """Token count; 0 for empty/blank text."""
    n = normalize_text(col)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(F.split(n, " ")))


# GPT-2-style pre-tokenizer pattern, restricted to constructs both Java
# regex and RE2 execute identically (no lookahead — RE2 has none; probed
# for parity on apostrophe contractions, unicode, and whitespace runs).
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: non-overlapping matches of the GPT-2-style
    pre-tokenizer split pattern over the RAW text — the budget-estimation
    complement to whitespace :func:`token_count` (subword tokenizers see
    punctuation, contractions, and digit runs as separate tokens, which
    whitespace counting underestimates)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.coalesce(c, F.lit("")), F.lit(BPE_SPLIT_PATTERN))


def o_bpe_token_count(expr: str) -> str:
    """DuckDB twin of :func:`bpe_token_count` (RE2 leftmost-first
    alternation matches Java's here — same generated pattern)."""
    pat = BPE_SPLIT_PATTERN.replace("'", "''")
    return f"CAST(len(regexp_extract_all(coalesce({expr}, ''), '{pat}')) AS INTEGER)"


def word_shingles_sql(col: Column | str, n: int = 3) -> Column:
    """Expression-only word n-gram shingles (the original construction;
    kept as :func:`word_shingles`' parity twin — see there for why the
    default moved off it).

    Pure-SQL: transform over a 0..len-n index sequence, joining n
    consecutive tokens with a single space. Documents shorter than n tokens
    yield one shingle (the whole normalized text).
    """
    t = tokens(col)
    k = F.size(t)
    shingled = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
    )
    return F.when(k >= n, shingled).otherwise(F.array(F.concat_ws(" ", t)))


# One pandas_udf instance per shingle width, created lazily and cached so
# every plan that shingles at width n shares ONE function identity — two
# subtrees built by separate word_shingles(n) calls stay canonically
# equal, which is what lets AQE reuse a tokenize/shingle exchange across
# branches (the same property test_plans.py pins for the LM chain).
_SHINGLE_UDFS: dict[int, object] = {}


def _shingle_join_udf(n: int):
    f = _SHINGLE_UDFS.get(n)
    if f is None:

        @F.pandas_udf("array<string>")
        def shingle_join(toks: pd.Series) -> pd.Series:
            def sh(t):
                if t is None:
                    # tokens(NULL) is NULL; the expression twin's
                    # otherwise-branch turns that into [''] (concat_ws
                    # skips nulls) — word_shingles is TOTAL (see
                    # operators/dedup.py), so match it exactly
                    return [""]
                if len(t) >= n:
                    return [
                        " ".join(t[i : i + n]) for i in range(len(t) - n + 1)
                    ]
                return [" ".join(t)]

            return toks.map(sh)

        _SHINGLE_UDFS[n] = f = shingle_join
    return f


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles → array<string> (for MinHash/Jaccard dedup).

    Tokenization stays JVM-side (:func:`tokens` — the exact semantics the
    DuckDB oracles replay); only the join-n-consecutive-tokens step runs
    as an Arrow-batched kernel over the token arrays. Measured r11 at
    sf0.1 (235k shingles, warm medians): the expression form
    (:func:`word_shingles_sql` — per-shingle ``slice``+``concat_ws``
    array allocation) costs 3.6 s, an ``element_at`` rewrite 21.7 s
    (lambda-bound element_at falls out of codegen), this kernel 0.63 s
    (5.7×). Output is bit-identical strings — no floats — so the kernel
    is oracle-safe as the DEFAULT for every consumer (minhash / n-gram
    Jaccard / LSH banding / span dedup / decontamination);
    ``tests/test_pyapi_paging.py``-style parity vs the SQL twin is
    pinned in ``tests/test_dedup_contract.py``."""
    return _shingle_join_udf(n)(tokens(col))


# --------------------------------------------------------------- language ID
# Tiny stopword inventories, chosen to be discriminative among the testdata
# corpus languages. Counting is done on the padded normalized text so word
# boundaries are plain spaces (SQL-portable; no \b needed).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "that", "with"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "es": ("el", "los", "las", "es", "una", "que", "por"),
}


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Total occurrences of ``lang``'s stopwords in the text: one token
    membership filter over the normalized token array. (Replaced the
    original padded-string split-counting — 7 splits per language, and it
    undercounted adjacent repeats because " w w " shares its middle
    space; ~30% faster at sf0.1 and the token semantics are the correct
    ones. Spark's subexpression elimination shares the tokenization
    across the four languages within one projection.)"""
    return F.size(
        F.filter(tokens(col), lambda x: x.isin(list(LANG_STOPWORDS[lang])))
    )


def lang_id(col: Column | str, default: str = "und") -> Column:
    """Predicted language = argmax of stopword hits; ``default`` when all 0.

    Ties break toward the alphabetically EARLIEST code (deterministic,
    oracle-replayable): forward iteration with strict '>' means the first
    code to reach the max keeps it — reverse iteration (the pre-r03 shape)
    silently inverted this to last-wins against the documented contract.
    """
    scores = {lang: stopword_hits(col, lang) for lang in sorted(LANG_STOPWORDS)}
    best_lang = F.lit(default)
    best_score = F.lit(0)
    # forward iteration: earlier codes win ties under strict '>'
    for lang in sorted(LANG_STOPWORDS):
        s = scores[lang]
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band, alpha ratio,
    mean-word-length band, stopword presence. SQL-portable by construction."""
    c = F.col(col) if isinstance(col, str) else col
    raw_len = F.length(F.coalesce(c, F.lit("")))
    ntoks = token_count(c)
    alpha = F.length(F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), "[^a-z]", ""))
    alpha_ratio = F.when(raw_len > 0, alpha / raw_len).otherwise(F.lit(0.0))
    mean_wlen = F.when(ntoks > 0, F.length(normalize_text(c)) / ntoks).otherwise(
        F.lit(0.0)
    )
    sw = stopword_hits(c, "en") + stopword_hits(c, "fr")
    len_band = F.when((ntoks >= 10) & (ntoks <= 5000), 1.0).otherwise(0.0)
    wlen_band = F.when((mean_wlen >= 2.5) & (mean_wlen <= 12.0), 1.0).otherwise(0.0)
    sw_band = F.when(ntoks > 0, F.least(sw / ntoks * F.lit(10.0), F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    return F.round(
        0.3 * len_band + 0.3 * alpha_ratio + 0.2 * wlen_band + 0.2 * sw_band, 6
    )


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.

    Robust to case/punct/whitespace changes; identical in DuckDB
    (``md5(...)`` hex string in both engines).
    """
    return F.md5(normalize_text(col))
