from qa_data_pipeline_rag_llm_spark.sources.ingest import (
    RAW_POST_SCHEMA,
    flatten_comments,
    keep_first,
    parse_posts,
    quality_filter,
)

__all__ = [
    "RAW_POST_SCHEMA",
    "flatten_comments",
    "keep_first",
    "parse_posts",
    "quality_filter",
]
