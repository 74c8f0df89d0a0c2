"""Registry entries: API-ingest normalization (SURVEY.md §2.1 S1-S4).

The HTTP fetch itself stays outside the engine; what the engine owns — and
what these queries oracle-check — is everything the reference does to raw
payloads in its driver loops (``/root/reference/REDDIT-Ingestion.py:
101-143``): JSON parse against an explicit schema, quality predicates,
cross-sort-mode keep-first dedup, and comment-forest flattening with a cap.
Raw payloads are synthesized deterministically from the ``documents`` table
so the oracle can compute the same result from base columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register
from qa_data_pipeline_rag_llm_spark.sources.ingest import (
    flatten_comments,
    keep_first,
    parse_posts,
    quality_filter,
)


def _payloads(d: DataFrame) -> DataFrame:
    """documents → one raw API payload JSON string per row (deterministic:
    title/flair/comment-count fault injection keyed on doc_id)."""
    payload = F.to_json(
        F.struct(
            F.concat(F.lit("t3_"), F.col("doc_id").cast("string")).alias("id"),
            F.when(F.col("doc_id") % 13 == 0, F.lit("[deleted]"))
            .when(F.col("doc_id") % 17 == 0, F.lit(""))
            .otherwise(F.substring("text", 1, 40))
            .alias("title"),
            F.col("source").alias("subreddit"),
            F.col("n_chars").alias("score"),
            (F.col("doc_id") % 9).alias("num_comments"),
            (F.lit(1_700_000_000) + F.col("doc_id") * 60).alias("created_utc"),
            F.when(F.col("doc_id") % 11 == 0, F.lit("Subreddit Moderator"))
            .when(F.col("doc_id") % 7 == 0, F.lit("helpful contributor"))
            .otherwise(F.lit(""))
            .alias("author_flair"),
        )
    )
    return d.select(payload.alias("payload"))


_INGEST_FIELDS_SQL = """
  SELECT CAST(doc_id AS VARCHAR) AS id_post,
         CASE WHEN doc_id % 13 = 0 THEN '[deleted]'
              WHEN doc_id % 17 = 0 THEN ''
              ELSE substr(text, 1, 40) END AS title,
         source AS subreddit,
         n_chars AS score,
         doc_id % 9 AS num_comments,
         1700000000 + doc_id * 60 AS created_utc,
         CASE WHEN doc_id % 11 = 0 THEN 'Subreddit Moderator'
              WHEN doc_id % 7 = 0 THEN 'helpful contributor'
              ELSE '' END AS author_flair
  FROM documents
"""


@register(
    "ingest_normalize_posts",
    f"""
    WITH p AS ({_INGEST_FIELDS_SQL})
    SELECT id_post, title, subreddit, score, num_comments,
           strftime(make_timestamp(created_utc * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS created,
           author_flair
    FROM p
    WHERE title IS NOT NULL AND trim(title) <> ''
      AND trim(title) NOT IN ('[deleted]', '[removed]')
      AND num_comments >= 2
      AND NOT regexp_matches(lower(coalesce(author_flair, '')), 'mod|admin')
    """,
    doc="S1+P6+F2: explicit-schema JSON payload parse, id prefix strip, "
    "epoch→timestamp, ingest quality predicates as one pushed WHERE "
    "(REDDIT-Ingestion.py:116-133).",
)
def ingest_normalize_posts(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _payloads(_t(spark, sf_dir, "documents"))
    posts = quality_filter(parse_posts(raw))
    return posts.select(
        "id_post",
        "title",
        "subreddit",
        "score",
        "num_comments",
        F.date_format("created", "yyyy-MM-dd HH:mm:ss").alias("created"),
        "author_flair",
    )


@register(
    "ingest_keep_first",
    """
    WITH cand AS (
      SELECT doc_id, 0 AS mode_rank, 'top' AS sort_mode
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, 1 AS mode_rank, 'new' AS sort_mode
      FROM documents WHERE doc_id % 3 <> 1
      UNION ALL
      SELECT doc_id, 2 AS mode_rank, 'hot' AS sort_mode FROM documents),
    r AS (SELECT doc_id, sort_mode,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY mode_rank) AS rn
          FROM cand)
    SELECT doc_id, sort_mode AS first_mode FROM r WHERE rn = 1
    """,
    doc="A3: cross-sort-mode dedup keeping the FIRST occurrence in ingest "
    "order — deterministic row_number twin of the reference's driver-dict "
    "dedup (REDDIT-Ingestion.py:116,124).",
)
def ingest_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _t(spark, sf_dir, "documents").select("doc_id")
    modes = [
        (base.filter(F.col("doc_id") % 2 == 0), 0, "top"),
        (base.filter(F.col("doc_id") % 3 != 1), 1, "new"),
        (base, 2, "hot"),
    ]
    cand = None
    for df, rank, mode in modes:
        tagged = df.withColumns(
            {"mode_rank": F.lit(rank), "sort_mode": F.lit(mode)}
        )
        cand = tagged if cand is None else cand.unionByName(tagged)
    first = keep_first(cand, ["doc_id"], [F.col("mode_rank")])
    return first.select("doc_id", F.col("sort_mode").alias("first_mode"))


@register(
    "flatten_comment_tree",
    """
    SELECT d.doc_id AS parent_post_id,
           g.i - 1 AS pos,
           d.doc_id * 100 + g.i AS comment_id,
           g.i * 10 AS comment_score
    FROM documents d
    CROSS JOIN (SELECT unnest(range(1, 7)) AS i) g
    WHERE g.i <= least(d.doc_id % 6, 3)
    """,
    doc="S2+O3: per-post comment-forest flatten with a hard cap — "
    "slice + posexplode, map-side only (REDDIT-Ingestion.py:62-80 caps "
    "at 100; cap=3 here so the truncation path is exercised).",
)
def flatten_comment_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    full = F.transform(
        F.sequence(F.lit(1), F.lit(6)),
        lambda i: F.struct(
            (F.col("doc_id") * 100 + i).alias("comment_id"),
            (i * 10).alias("comment_score"),
        ),
    )
    posts = d.select(
        F.col("doc_id").alias("id_post"),
        F.slice(full, 1, (F.col("doc_id") % 6).cast("int")).alias("comments"),
    )
    return flatten_comments(posts, max_per_post=3)


@register(
    "pysource_api_scan",
    """
    SELECT 't3_' || CAST(doc_id AS VARCHAR) AS id_post,
           substr(coalesce(text, ''), 1, 40) AS title,
           CAST(n_chars AS BIGINT) AS score,
           CAST(doc_id // 100 AS INTEGER) AS page
    FROM documents
    """,
    doc="S1/S3 as a Spark 4 PYTHON DATA SOURCE (sources/pyapi.py): the "
    "reference's paged-API driver loops (REDDIT-Ingestion.py:43-59, "
    "STACK-Ingestion.py:40-64) become spark.read.format('qa_api') — one "
    "input partition per API page, so fetch parallelism scales with "
    "executors; rows arrive schema'd and normalized (t3_ ids, capped "
    "titles). Transport is a deterministic local page server (pyarrow), "
    "so the whole connector is oracle-checked end to end.",
)
def pysource_api_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.sources.pyapi import register_qa_api

    register_qa_api(spark)
    return (
        spark.read.format("qa_api")
        .option("path", f"{sf_dir}/documents.parquet")
        .option("page_size", "100")
        .load()
    )


@register(
    "pysource_api_stream",
    """
    SELECT 't3_' || CAST(doc_id AS VARCHAR) AS id_post,
           substr(coalesce(text, ''), 1, 40) AS title,
           CAST(n_chars AS BIGINT) AS score,
           CAST(doc_id // 100 AS INTEGER) AS page
    FROM documents
    """,
    doc="The reference's polling-with-sleep ingest loop "
    "(REDDIT-Ingestion.py:57-59) as a Spark 4 Python STREAMING data "
    "source: page-number offsets, one page per micro-batch, exactly-once "
    "replay via readBetweenOffsets (sources/pyapi.py). Stream output "
    "equals the batch connector's output, so the streaming connector is "
    "held to the same full value-hash oracle as the batch one.",
)
def pysource_api_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.sources.pyapi import run_api_stream

    return run_api_stream(spark, f"{sf_dir}/documents.parquet", page_size=100)


@register(
    "ingest_corrupt_payloads",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_payloads,
           CAST(SUM(CASE WHEN doc_id % 23 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corrupt,
           CAST(SUM(CASE WHEN doc_id % 23 = 0 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_valid
    FROM documents
    """,
    doc="S1 fault path: truncated (malformed) JSON payloads under "
    "explicit-schema from_json yield NULL parses instead of failing the "
    "job — the PERMISSIVE ingest contract a real API scraper needs "
    "(partial pages, interrupted responses). The audit counts corrupt "
    "vs valid in one pass; the oracle recomputes the deterministic "
    "fault-injection rule from base columns.",
)
def ingest_corrupt_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.sources.ingest import RAW_POST_SCHEMA

    d = _t(spark, sf_dir, "documents")
    payload = F.to_json(
        F.struct(
            F.concat(F.lit("t3_"), F.col("doc_id").cast("string")).alias("id"),
            F.col("source").alias("subreddit"),
            F.col("n_chars").alias("score"),
        )
    )
    corrupted = F.when(
        F.col("doc_id") % 23 == 0, F.substring(payload, 1, 10)
    ).otherwise(payload)
    parsed = d.select(F.from_json(corrupted, RAW_POST_SCHEMA).alias("p"))
    return parsed.agg(
        F.count("*").alias("n_payloads"),
        F.sum(F.when(F.col("p.id").isNull(), 1).otherwise(0)).alias("n_corrupt"),
        F.sum(F.when(F.col("p.id").isNull(), 0).otherwise(1)).alias("n_valid"),
    )
