"""Normalization operators (P1-P9, F1-F5): the reference's cleaning stages.

Re-expresses the four ``*-Nettoyage-*`` scripts as composable functions:
renames, drops, NOT-IN body filter, bot-regex anti-filter, HTML strip, id
normalization, epoch→timestamp typing (the reference keeps raw epoch numbers
end-to-end — SURVEY.md §1.2). Everything is built-in Column expressions;
the plans stay fully codegen'd and pushdown-friendly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.text import html_strip, strip_id_prefix

#: P3 — bodies dropped by the reference (`REDDIT-Nettoyage-Comms.py:49`,
#: `STACK-Nettoyage-Comms.py:69`; ingest-time twin `REDDIT-Ingestion.py:70`).
DELETED_BODIES = ("[deleted]", "[removed]")

#: P4/F4 — the reference's 7 anchored bot/mod regexes, OR-joined
#: (`REDDIT-Nettoyage-Comms.py:76-88`, `STACK-Nettoyage-Comms.py:108-120`).
#: Kept to the regex subset common to Java and RE2 dialects.
BOT_PATTERNS = (
    "^I'm a bot,",
    "^I am a bot",
    "^Your submission has been removed",
    "^Your post has been removed",
    "^Welcome to r/",
    "^This post has been locked",
    "^\\*I am a bot, and this action was performed automatically",
)
BOT_REGEX = "|".join(BOT_PATTERNS)


def drop_deleted(df: DataFrame, col: str = "body") -> DataFrame:
    """P3 NOT-IN filter. NULL bodies are dropped too (pinned semantics:
    Spark's ``~isin`` is NULL-unsafe, same as the reference)."""
    return df.filter(~F.col(col).isin(*DELETED_BODIES))


def drop_bot_messages(df: DataFrame, col: str = "body") -> DataFrame:
    """P4 regex anti-filter; NULL-safe (NULL body rows are kept here —
    they were already handled by :func:`drop_deleted`)."""
    return df.filter(~F.coalesce(F.col(col), F.lit("")).rlike(BOT_REGEX))


def clean_html_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """F1 — strip HTML from ``cols`` (SQL path; see functions.text)."""
    return df.withColumns({c: html_strip(c) for c in cols})


def epoch_to_timestamp(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Type raw epoch-second columns to TimestampType — fixing the
    reference's untyped dates (`REDDIT-Ingestion.py:75,131`)."""
    out = df
    for src, dst in mapping.items():
        out = out.withColumn(dst, F.timestamp_seconds(F.col(src).cast("double")))
        if src != dst:
            out = out.drop(src)
    return out


def normalize_reddit_posts(df: DataFrame) -> DataFrame:
    """REDDIT-Nettoyage-Posts (`/root/reference/REDDIT-Nettoyage-Posts.py:54-58`):
    renames Subreddit→community, created_utc→date; plus engine decisions:
    id prefix strip, string ids, typed date."""
    return (
        df.withColumn("id_post", strip_id_prefix("id_post").cast("string"))
        .withColumnRenamed("Subreddit", "community")
        .transform(lambda d: epoch_to_timestamp(d, {"created_utc": "date"}))
        .select(
            "platform", "community", "id_post", "title", "body", "score", "date", "link"
        )
    )


def normalize_stack_questions(df: DataFrame) -> DataFrame:
    """STACK-Nettoyage-Posts (`STACK-Nettoyage-Posts.py:60-68`): renames
    site→community, question_id→id_post, creation_date→date; drops
    answer_count, last_activity_date; HTML-strips title+body; casts the
    int id to string (type unification, SURVEY.md §1.4)."""
    return (
        df.withColumn("id_post", F.col("question_id").cast("string"))
        .withColumnRenamed("site", "community")
        .transform(lambda d: epoch_to_timestamp(d, {"creation_date": "date"}))
        .transform(lambda d: clean_html_columns(d, ["title", "body"]))
        .select(
            "platform", "community", "id_post", "title", "body", "score", "date", "link"
        )
    )


def normalize_reddit_comments(df: DataFrame) -> DataFrame:
    """REDDIT-Nettoyage-Comms filter chain (`:49,63-67,76-88`) minus the
    ranking step (operators.ranking owns W1)."""
    return (
        df.transform(drop_deleted)
        .transform(drop_bot_messages)
        .transform(lambda d: epoch_to_timestamp(d, {"created_utc": "date"}))
        .select("id_comment", "body", "score", "date", "parent_post_id")
    )


def normalize_stack_answers(df: DataFrame) -> DataFrame:
    """STACK-Nettoyage-Comms (`:54-60,69,75-81,108-120`): renames
    answer_id→id_comment, parent_question_id→parent_post_id; drops
    is_accepted/owner_*; NOT-IN + bot filters; HTML strip."""
    return (
        df.withColumn("id_comment", F.col("answer_id").cast("string"))
        .withColumn("parent_post_id", F.col("parent_question_id").cast("string"))
        .transform(drop_deleted)
        .transform(drop_bot_messages)
        .transform(lambda d: clean_html_columns(d, ["body"]))
        .transform(lambda d: epoch_to_timestamp(d, {"creation_date": "date"}))
        .select("id_comment", "body", "score", "date", "parent_post_id")
    )
