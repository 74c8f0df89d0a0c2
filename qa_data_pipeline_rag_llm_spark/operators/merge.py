"""Corpus merge (U1) + keyed dedup (A3).

The reference unions the two platform corpora POSITIONALLY
(``/root/reference/PLATFORM-Merge.py:56``) and never dedups despite the
README claiming it (``README.md:48`` — SURVEY.md §5). This engine unions by
name with schema reconciliation and offers the documented-but-missing dedup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def union_corpus(*dfs: DataFrame, dedup_key: Sequence[str] | None = None) -> DataFrame:
    """UNION ALL by column name (missing columns → NULL); optional exact
    dedup on ``dedup_key`` keeping an arbitrary-but-deterministic row."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    if dedup_key:
        out = dedup_first(out, dedup_key, order_by=list(out.columns))
    return out


def dedup_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """A3 — keep-first dedup with an explicit order (the reference's dict
    keyed on post id keeps first-by-ingest-order, `REDDIT-Ingestion.py:116,124`;
    Spark's dropDuplicates keeps an ARBITRARY row, so we pin one)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc_nulls_last() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
