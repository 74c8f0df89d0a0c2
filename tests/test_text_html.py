"""HTML-strip parity: SQL path vs full-parser Arrow UDF (SURVEY §5 item 5).

The reference's only UDF is BeautifulSoup ``get_text()``
(``/root/reference/STACK-Nettoyage-Posts.py:77-87``). The engine ships two
paths: ``html_strip`` (pure SQL — codegen'd, oracle-exact, entity table
limited to HTML_ENTITIES) and ``clean_html_bs4`` (Arrow pandas_udf over a
real parser). These tests pin where they AGREE and document exactly where
they diverge, so neither can drift silently.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.text import (
    _HAVE_BS4,
    HTML_ENTITIES,
    _extract_text_py,
    clean_html_bs4,
    html_strip,
)

# Inputs where both paths MUST agree (the reference corpus shapes).
AGREE = [
    "<p>plain paragraph</p>",
    "<b>bold</b> and <i>italic</i> text",
    "no markup at all",
    "a &lt; b &amp;&amp; c &gt; d",
    "<a href='x'>link &quot;quoted&quot;</a>",
    "it&#39;s here spaced",
    "it&#x27;s hex &apos;apos&#34; forms",
    "<div><span>nested</span> <em>tags</em></div>",
    "",
]

# Documented divergences: (input, sql_path_output, parser_output).
DIVERGE = [
    # numeric entity outside the SQL table: parser decodes, SQL passes through
    ("smart &#8217;quote", "smart &#8217;quote", "smart ’quote"),
    # double-encoded: parser decodes ONCE (&amp;lt; → &lt;); the SQL chain
    # would also decode once here (amp last) — they agree; pin that too
    ("x &amp;lt; y", "x &lt; y", "x &lt; y"),
    # &nbsp;: the SQL table maps to a plain space (downstream tokenizers
    # want ASCII); the parser is faithful to HTML and emits U+00A0
    ("a&nbsp;b", "a b", "a\xa0b"),
    # unclosed tag-soup: BS4's tokenizer consumes the unterminated tag to
    # EOF ("broken "); stdlib html.parser flushes it back out as data on
    # close() — pin whichever parser is actually installed
    (
        "broken <b unclosed",
        "broken <b unclosed",
        "broken " if _HAVE_BS4 else "broken <b unclosed",
    ),
    # comparison operators that LOOK like a tag open: both paths eat
    # '<b and c>' as if it were a tag — the inherent regex/parser hazard
    ("if a<b and c>d", "if ad", "if ad"),
]


def test_python_parser_agrees_with_sql_on_reference_shapes(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(AGREE)], "i int, s string")
    out = (
        df.select(
            "i",
            html_strip("s").alias("sql_path"),
            clean_html_bs4(F.col("s")).alias("parser_path"),
        )
        .orderBy("i")
        .collect()
    )
    for row, src in zip(out, AGREE):
        assert row.sql_path == row.parser_path, f"diverged on {src!r}"


@pytest.mark.parametrize("src,sql_expected,parser_expected", DIVERGE)
def test_documented_divergences(spark, src, sql_expected, parser_expected):
    df = spark.createDataFrame([(src,)], "s string")
    row = df.select(
        html_strip("s").alias("sql_path"),
        clean_html_bs4(F.col("s")).alias("parser_path"),
    ).first()
    assert row.sql_path == sql_expected
    assert row.parser_path == parser_expected


def test_parser_handles_numeric_and_hex_entities():
    assert _extract_text_py("&#65;&#x42;") == "AB"
    assert _extract_text_py("<p>caf&eacute;</p>") == "café"


def test_null_safety(spark):
    df = spark.createDataFrame([(None,)], "s string")
    row = df.select(
        html_strip("s").alias("a"), clean_html_bs4(F.col("s")).alias("b")
    ).first()
    assert row.a is None and row.b is None


def test_entity_table_decodes_single_pass():
    """&amp; spellings must sit last so double-encoded text decodes once."""
    amp_positions = [
        i for i, (e, _) in enumerate(HTML_ENTITIES) if e in ("&amp;", "&#38;")
    ]
    assert amp_positions == [len(HTML_ENTITIES) - 2, len(HTML_ENTITIES) - 1]
