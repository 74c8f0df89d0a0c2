"""Text-analysis operators over a document corpus.

Extension surface (not in the reference, which does no text analytics —
SURVEY.md §2.11 intro): language ID, quality scoring, token counting,
fingerprinting — the per-document scoring pass of a training-data pipeline.

All columns are built-in expressions (functions.text) ⇒ one codegen'd
projection over the scan: at 100 TB this is an embarrassingly parallel
map with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.operators.util import ensure_parallelism
from qa_data_pipeline_rag_llm_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document: predicted language, token count, quality, fingerprint."""
    df = ensure_parallelism(df)
    return df.select(
        F.col(id_col),
        lang_id(text_col).alias("lang_pred"),
        token_count(text_col).alias("n_tokens"),
        quality_score(text_col).alias("quality"),
        fingerprint(text_col).alias("fingerprint"),
    )
