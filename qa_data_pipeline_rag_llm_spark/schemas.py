"""Explicit schemas for every table the engine touches.

The reference infers all schemas from CSV (``inferSchema=True`` at e.g.
``/root/reference/REDDIT-Nettoyage-Posts.py:37-46``), which costs an extra
full scan per read and silently coerces types (SURVEY.md §1.2). This engine
declares every schema: reads are single-pass and type drift is an error.

Two families:
  * TESTDATA_SCHEMAS — the driver's TPC-H-ish tables (TESTDATA.md).
  * Domain fixture schemas — the reference pipeline's shapes (FIXTURES.md),
    with the §1.4 normalization decisions applied (ids → string, epoch →
    timestamp) where noted.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# ---------------------------------------------------------------- testdata
TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": _s(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _s(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _s(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _s(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _s(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _s(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    # ts's physical type has varied across testdata generations (ns-int64
    # under nanosAsLong vs µs TIMESTAMP_NTZ); LongType here is the declared
    # default — catalog.events_read_schema probes the footer and
    # normalize_events_ts brings either form to µs TimestampType.
    "events": _s(
        ("event_id", LongType()),
        ("ts", LongType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _s(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _s(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)


# ------------------------------------------------- domain fixtures (FIXTURES.md)
# Raw ingest shapes; cites are file:line into /root/reference/.

# REDDIT-Ingestion.py:124-133
REDDIT_POSTS = _s(
    ("platform", StringType()),
    ("Subreddit", StringType()),
    ("id_post", StringType()),
    ("title", StringType()),
    ("body", StringType()),
    ("score", LongType()),
    ("created_utc", DoubleType()),
    ("link", StringType()),
)

# REDDIT-Ingestion.py:71-77
REDDIT_COMMENTS = _s(
    ("id_comment", StringType()),
    ("body", StringType()),
    ("score", LongType()),
    ("created_utc", DoubleType()),
    ("parent_post_id", StringType()),
)

# STACK-Ingestion.py:135-146
STACK_QUESTIONS = _s(
    ("platform", StringType()),
    ("site", StringType()),
    ("question_id", LongType()),
    ("title", StringType()),
    ("body", StringType()),
    ("score", LongType()),
    ("answer_count", LongType()),
    ("creation_date", LongType()),
    ("last_activity_date", LongType()),
    ("link", StringType()),
)

# STACK-Ingestion.py:90-99
STACK_ANSWERS = _s(
    ("answer_id", LongType()),
    ("body", StringType()),
    ("score", LongType()),
    ("creation_date", LongType()),
    ("is_accepted", BooleanType()),
    ("parent_question_id", LongType()),
    ("owner_reputation", LongType()),
    ("owner_display_name", StringType()),
)

# Unified corpus after clean→rank→join→union (PLATFORM-Merge.py:56), arrays
# kept native instead of the reference's CSV-stringified lists (SURVEY.md §1.2).
INFOS = _s(
    ("platform", StringType()),
    ("community", StringType()),  # reference name: "SubReddit/Community"
    ("id_post", StringType()),
    ("title", StringType()),
    ("body", StringType()),
    ("score", LongType()),
    ("date", TimestampType()),  # reference keeps raw epoch; we type it
    ("link", StringType()),
    ("comment_ids", ArrayType(StringType())),
)

# infos + clustering outputs (PLATFORM-contextual-Chunking.py:94-113,245)
INFOS_CLUSTERISES = StructType(
    INFOS.fields
    + [
        StructField("cluster", IntegerType(), True),
        StructField("posts_similaires", ArrayType(StringType()), True),
    ]
)

# Cleaned comments, both platforms (REDDIT-Nettoyage-Comms.py / STACK-Nettoyage-Comms.py)
CLEAN_COMMENTS = _s(
    ("id_comment", StringType()),
    ("body", StringType()),
    ("score", LongType()),
    ("date", TimestampType()),
    ("parent_post_id", StringType()),
)
