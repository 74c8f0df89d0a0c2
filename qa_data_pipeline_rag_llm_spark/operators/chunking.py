"""Contextual chunking: split documents into overlapping windows.

The reference README *claims* contextual chunking (`README.md:50-54`) but
never implements it — `PLATFORM-contextual-Chunking.py` embeds whole
posts (SURVEY.md §5). This operator supplies the real thing, Spark-first:
pure built-in expressions (sequence → transform → posexplode), no UDF, so
chunking runs inside whole-stage codegen and scales linearly with no
shuffle at all — each input row expands to its chunks within the same
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 120,
    stride: int = 90,
) -> DataFrame:
    """Explode each row into overlapping character windows.

    Chunk ``i`` covers ``[1 + i*stride, 1 + i*stride + chunk_size)``
    (1-based, capped at the string end); the chunk count is
    ``max(1, ceil((len - (chunk_size - stride)) / stride))`` so the final
    window always reaches the end of the text and a short text still
    yields exactly one chunk.

    Adds: ``chunk_id`` (0-based), ``chunk_start`` (1-based), ``n_chunks``,
    ``chunk_text``. Every other input column is preserved.
    """
    if stride <= 0 or chunk_size < stride:
        raise ValueError("need 0 < stride <= chunk_size")
    overlap = chunk_size - stride
    # ceil((len - overlap) / stride) via integer floor-div; min length of
    # a real text makes the numerator positive, but clamp to 1 anyway so
    # empty strings still produce one (empty) chunk.
    n_chunks = F.greatest(
        F.lit(1),
        (
            F.floor(
                (F.length(text_col) - F.lit(overlap) + F.lit(stride - 1))
                / F.lit(stride)
            )
        ).cast("int"),
    )
    chunks = F.expr(
        f"transform(sequence(0, n_chunks - 1), "
        f"i -> substring({text_col}, 1 + i * {stride}, {chunk_size}))"
    )
    other = [c for c in df.columns]
    return (
        df.withColumn("n_chunks", n_chunks)
        .select(
            *other,
            "n_chunks",
            F.posexplode(chunks).alias("chunk_id", "chunk_text"),
        )
        .withColumn("chunk_id", F.col("chunk_id").cast("long"))
        .withColumn(
            "chunk_start", (F.lit(1) + F.col("chunk_id") * F.lit(stride)).cast("long")
        )
    )
