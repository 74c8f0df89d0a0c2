"""Vector expressions over ``array<float>`` embedding columns.

Pure higher-order-function Columns (zip_with / aggregate) — JVM-side, no
Python boundary, and directly replayable in DuckDB via
``list_dot_product`` / ``list_cosine_similarity``.

The reference stores 384-d MiniLM vectors in Qdrant and searches cosine
top-1 (``/root/reference/PLATFORM-contextual-Chunking.py:137-174``,
``app2.py:32-45``); here embeddings are a first-class Parquet column and
similarity is a relational rank.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    # float32 inputs are upcast to double BEFORE multiplying so the result
    # matches the DuckDB oracle (which computes list products in double).
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def safe_denom(d: Column) -> Column:
    """NULL instead of 0: an undefined cosine (zero-norm vector) must
    come back NULL — which BOTH engines sort LAST under DESC — never
    NaN/Infinity, which Spark and DuckDB sort ABOVE every real number
    and which would park a zero vector at rank 1 of every probe
    (review r03)."""
    return F.when(d > 0, d)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / safe_denom(norm(a) * norm(b))
