"""Property tests for the chunking operator (SURVEY.md §5.4 style)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.operators.chunking import chunk_text
from tests.conftest import SF_DIR


def test_chunks_reconstruct_text(spark, tables):
    """Stitching chunk[0] + each later chunk's tail (past the overlap)
    reproduces the original text exactly — no gaps, no loss at either
    boundary."""
    chunk_size, stride = 120, 90
    docs = tables["documents"].select("doc_id", "text")
    chunks = chunk_text(docs, "text", chunk_size=chunk_size, stride=stride)
    rebuilt = (
        chunks.withColumn(
            "piece",
            F.when(F.col("chunk_id") == 0, F.col("chunk_text")).otherwise(
                F.substring("chunk_text", chunk_size - stride + 1, stride)
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_id", "piece"))).piece
            ).alias("rebuilt")
        )
    )
    bad = (
        docs.join(rebuilt, "doc_id")
        .filter(F.col("text") != F.col("rebuilt"))
        .count()
    )
    assert bad == 0


def test_chunk_bounds(spark, tables):
    """Every chunk is non-empty, <= chunk_size, and counts match n_chunks."""
    chunks = chunk_text(
        tables["documents"].select("doc_id", "text"), "text", 120, 90
    )
    stats = chunks.groupBy("doc_id", "n_chunks").agg(
        F.count("*").alias("n"),
        F.max(F.length("chunk_text")).alias("mx"),
        F.min(F.length("chunk_text")).alias("mn"),
    )
    assert (
        stats.filter(
            (F.col("n") != F.col("n_chunks"))
            | (F.col("mx") > 120)
            | (F.col("mn") < 1)
        ).count()
        == 0
    )


def test_connected_components_invariants(spark, tables):
    """CC labels: minimal (label = min id in component) and consistent
    (every edge's endpoints share a label)."""
    from pyspark.sql import functions as F

    from qa_data_pipeline_rag_llm_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20), (5, 3)], "src long, dst long"
    )
    labels = {r["id"]: r["label"] for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 5: 1, 10: 10, 11: 10, 20: 20}
