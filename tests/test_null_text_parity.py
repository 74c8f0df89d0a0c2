"""Cross-engine NULL/empty-text parity for the shingle and fingerprint
fragments (the latent divergence class: testdata has no NULL text, so the
golden oracles can't see it — this pins it on synthetic rows)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from qa_data_pipeline_rag_llm_spark.functions.text import (
    fingerprint,
    word_shingles,
)
from qa_data_pipeline_rag_llm_spark.plans import oracle_fragments as O

ROWS = [(1, None), (2, ""), (3, "   "), (4, "a"), (5, "x y z w")]
VALUES = "(VALUES (1, CAST(NULL AS VARCHAR)), (2, ''), (3, '   '), (4, 'a'), (5, 'x y z w')) t(id, text)"


def test_shingles_match_on_null_and_empty(spark):
    got = {
        r.id: list(r.sh)
        for r in spark.createDataFrame(ROWS, "id int, text string")
        .select("id", word_shingles("text", 3).alias("sh"))
        .collect()
    }
    want = {
        i: list(sh)
        for i, sh in duckdb.sql(
            f"SELECT id, {O.shingles('text', 3)} FROM {VALUES}"
        ).fetchall()
    }
    assert got == want


def test_fingerprint_matches_on_null_and_empty(spark):
    got = {
        r.id: r.fp
        for r in spark.createDataFrame(ROWS, "id int, text string")
        .select("id", fingerprint("text").alias("fp"))
        .collect()
    }
    want = {
        i: fp
        for i, fp in duckdb.sql(
            f"SELECT id, {O.fingerprint('text')} FROM {VALUES}"
        ).fetchall()
    }
    assert got == want


def test_token_count_matches_on_null_and_empty(spark):
    from qa_data_pipeline_rag_llm_spark.functions.text import token_count

    got = {
        r.id: r.n
        for r in spark.createDataFrame(ROWS, "id int, text string")
        .select("id", token_count("text").alias("n"))
        .collect()
    }
    want = {
        i: n
        for i, n in duckdb.sql(
            f"SELECT id, {O.token_count('text')} FROM {VALUES}"
        ).fetchall()
    }
    assert got == want
