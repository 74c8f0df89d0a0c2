"""API-ingest normalization operators (SURVEY.md §2.1 S1-S4).

The reference ingests Reddit submissions and StackExchange questions with
paged API fetches driven by single-threaded driver Python
(``/root/reference/REDDIT-Ingestion.py:43-59,101-143``,
``/root/reference/STACK-Ingestion.py:40-64,109-156``): quality predicates
run row-by-row in the fetch loop (``REDDIT-Ingestion.py:116-121``),
cross-sort-mode dedup is a driver-side dict keyed on post id
(``REDDIT-Ingestion.py:116,124``), and each post's comment forest is
flattened imperatively with a hard cap (``REDDIT-Ingestion.py:62-80``).

Here ingest is a DataFrame program, so normalization scales with the
cluster instead of the driver:

* raw API payloads are JSON strings parsed once with an explicit schema
  (``from_json`` — no inference pass);
* quality predicates are a single ``WHERE`` clause, pushed to the scan;
* keep-first dedup is a ``row_number`` over explicit ingest order — the
  only shuffle in the path, on the post id;
* the comment forest flattens with ``slice`` + ``posexplode`` — map-side.

The actual HTTP fetch stays out of the engine (an ingest job appends raw
payload files to object storage; at scale that is the only sane boundary —
executors must not hold API rate-limit state).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: Explicit payload schema — the fields the reference keeps from the Reddit
#: submission object (``REDDIT-Ingestion.py:124-133``).
RAW_POST_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("title", StringType()),
        StructField("subreddit", StringType()),
        StructField("score", LongType()),
        StructField("num_comments", LongType()),
        StructField("created_utc", LongType()),
        StructField("author_flair", StringType()),
    ]
)

#: Substring indicators the reference checks against lower-cased flair
#: (``REDDIT-Ingestion.py:83-97`` — 'mod' also catches 'moderator').
MOD_FLAIR_RE = "mod|admin"


def parse_posts(raw: DataFrame, json_col: str = "payload") -> DataFrame:
    """Parse raw API payload JSON into typed columns.

    S1 normalization: explicit-schema ``from_json`` (malformed payloads
    yield NULL columns, filtered by :func:`quality_filter`), ``t3_`` id
    prefix strip (F2 — ``REDDIT-Ingestion.py:76,127``), epoch seconds →
    ``TimestampType`` (the reference keeps raw epochs end-to-end, §1.2).
    """
    p = raw.withColumn("_p", F.from_json(F.col(json_col), RAW_POST_SCHEMA))
    return p.select(
        F.regexp_replace(F.col("_p.id"), "^t3_", "").alias("id_post"),
        F.col("_p.title").alias("title"),
        F.col("_p.subreddit").alias("subreddit"),
        F.col("_p.score").alias("score"),
        F.col("_p.num_comments").alias("num_comments"),
        F.timestamp_seconds(F.col("_p.created_utc")).alias("created"),
        F.col("_p.author_flair").alias("author_flair"),
    )


def quality_filter(posts: DataFrame, min_comments: int = 2) -> DataFrame:
    """P6 ingest-time quality predicates as one pushed-down WHERE clause.

    Mirrors ``REDDIT-Ingestion.py:116-121``: drop empty/'[deleted]' titles,
    posts with fewer than ``min_comments`` comments, and moderator-flaired
    authors (case-normalized substring match, ``:83-97``).
    """
    t = F.trim(F.col("title"))
    return posts.filter(
        F.col("title").isNotNull()
        & (t != "")
        & ~t.isin("[deleted]", "[removed]")
        & (F.col("num_comments") >= min_comments)
        & ~F.coalesce(F.lower("author_flair"), F.lit("")).rlike(MOD_FLAIR_RE)
    )


def keep_first(
    df: DataFrame, key_cols: Sequence[str], order_cols: Sequence
) -> DataFrame:
    """A3 dedup-by-key keeping the FIRST row in explicit ingest order.

    The reference gets keep-first for free from a driver dict
    (``REDDIT-Ingestion.py:116,124``); ``dropDuplicates`` alone keeps an
    *arbitrary* row under shuffle, so the deterministic equivalent is a
    ``row_number`` over the ingest-order columns. One shuffle on the key.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def flatten_comments(
    posts: DataFrame,
    comments_col: str = "comments",
    max_per_post: int = 100,
    parent_col: str = "id_post",
) -> DataFrame:
    """S2/O3: flatten the per-post comment array, capped at
    ``max_per_post`` (the reference truncates the flattened forest at 100 —
    ``REDDIT-Ingestion.py:62-80``). ``slice`` before ``posexplode`` keeps
    the cap map-side; no shuffle.
    """
    capped = F.slice(F.col(comments_col), 1, max_per_post)
    return posts.select(
        F.col(parent_col).alias("parent_post_id"),
        F.posexplode(capped).alias("pos", "comment"),
    ).select("parent_post_id", "pos", "comment.*")
