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

from pyspark.sql import Column
from pyspark.sql import functions as F

# Matches tags and the handful of entities the reference corpus uses.
_TAG_RE = "<[^>]+>"


def html_strip(col: Column | str) -> Column:
    """Strip HTML tags and unescape common entities, null-safe.

    SQL-expressible analogue of the reference's BS4 ``clean_html`` UDF
    (``STACK-Nettoyage-Posts.py:77-87``; the comments variant at
    ``STACK-Nettoyage-Comms.py:75-81`` is NOT null-safe — we are).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, _TAG_RE, "")
    for ent, ch in [
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # last, so &amp;lt; doesn't double-decode
    ]:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def strip_id_prefix(col: Column | str, prefix: str = "t3_") -> Column:
    """Reddit fullname prefix strip (``REDDIT-Ingestion.py:76,127``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, f"^{prefix}", "")


def normalize_text(col: Column | str) -> Column:
    """Canonical text for fingerprinting/dedup: lowercase, collapse
    non-alphanumerics to single spaces, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column | str) -> Column:
    """Token count; 0 for empty/blank text."""
    n = normalize_text(col)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(F.split(n, " ")))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles → array<string> (for MinHash/Jaccard dedup).

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


def _padded(col: Column | str) -> Column:
    return F.concat(F.lit(" "), normalize_text(col), F.lit(" "))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Total occurrences of ``lang``'s stopwords in the text."""
    p = _padded(col)
    hits = [
        F.size(F.split(p, f" {w} ", -1)) - F.lit(1) for w in LANG_STOPWORDS[lang]
    ]
    total = hits[0]
    for h in hits[1:]:
        total = total + h
    return total


def lang_id(col: Column | str, default: str = "und") -> Column:
    """Predicted language = argmax of stopword hits; ``default`` when all 0.

    Ties break by language code order (deterministic, oracle-replayable).
    """
    scores = {lang: stopword_hits(col, lang) for lang in sorted(LANG_STOPWORDS)}
    best_lang = F.lit(default)
    best_score = F.lit(0)
    # iterate in reverse so earlier codes win ties with strict '>'
    for lang in sorted(LANG_STOPWORDS, reverse=True):
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
