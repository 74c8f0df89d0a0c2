"""Registry entries: scale patterns (chunking, skew salting, CSV parity).

  * ``chunk_documents`` — the contextual chunking the reference README
    claims but never ships (README.md:50-54 vs
    PLATFORM-contextual-Chunking.py which embeds whole posts —
    SURVEY.md §5). Shuffle-free row explosion, fully oracle-checked.
  * ``salted_agg_events`` / ``salted_join_event_revenue`` — hot-key
    mitigation patterns whose results are provably identical to the
    unsalted plans (the oracle IS the unsalted plan).
  * ``csv_roundtrip_documents`` — S5/K2 parity (SURVEY.md §2.1/§2.2):
    the reference's CSV read path needs multiLine + quote/escape '"';
    this query writes text containing embedded quotes AND newlines
    through the distributed CSV sink, reads it back with an explicit
    schema (no inferSchema double-scan), and proves byte integrity
    against aggregates DuckDB computes straight from parquet.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.operators.chunking import chunk_text
from qa_data_pipeline_rag_llm_spark.operators.skew import (
    replicate_dim_for_salted_join,
    salt_fact,
    salted_aggregate,
)
from qa_data_pipeline_rag_llm_spark.plans import oracle_fragments as O

_CSV_RT_CLEANUP: set[str] = set()
from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register


@register(
    "chunk_documents",
    """
    SELECT d.doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(1 + i * 90 AS BIGINT) AS chunk_start,
           d.n_chunks,
           substr(d.text, CAST(1 + i * 90 AS INT), 120) AS chunk_text
    FROM (SELECT doc_id, text,
                 CAST(greatest(1, (length(text) - 30 + 89) // 90) AS INT) AS n_chunks
          FROM documents) d,
         LATERAL unnest(range(d.n_chunks)) AS t(i)
    """,
    bench=True,
    doc="Contextual chunking (README.md:50-54's unimplemented claim): "
    "overlapping 120-char windows, stride 90. sequence→transform→"
    "posexplode — whole-stage codegen, zero shuffle; at 100 TB this is "
    "a pure map stage.",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_text(d, "text", chunk_size=120, stride=90).select(
        "doc_id", "chunk_id", "chunk_start", "n_chunks", "chunk_text"
    )


@register(
    "salted_agg_events",
    """
    SELECT event_type, COUNT(*) AS n,
           round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
    FROM events GROUP BY event_type
    """,
    doc="Two-stage salted aggregation over a hot-key-prone low-cardinality "
    "key (5 event types × millions of rows at scale → 5 reducers "
    "unsalted). groupBy(type, salt32) partials, then a 160-row final "
    "merge. Oracle is the UNSALTED aggregate — salting is provably "
    "semantics-free.",
)
def salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        group_by=["event_type"],
        partial_aggs=[
            F.count("*").alias("_n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_sv"),
        ],
        final_aggs=[
            F.sum("_n").alias("n"),
            F.round(F.sum("_sv").cast("double"), 4).alias("total_value"),
        ],
        salt_from="event_id",
        n_salts=32,
    )


@register(
    "salted_join_event_revenue",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_events,
           round(CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Salted fact-dim equi-join: dim replicated ×8 salts, fact salted "
    "by xxhash64(event_id) — each hot user's rows fan out over 8 tasks "
    "instead of one. Pattern for broadcast-ineligible dims / pre-AQE "
    "skew; oracle is the plain unsalted join.",
)
def salted_join_event_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_salts = 8
    ev = salt_fact(_t(spark, sf_dir, "events"), "event_id", n_salts)
    c = replicate_dim_for_salted_join(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"), n_salts
    )
    return (
        ev.join(
            c,
            (ev.user_id == c.c_custkey) & (ev["_salt"] == c["_salt"]),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("total_value"),
        )
    )


@register(
    "csv_roundtrip_documents",
    """
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(length(text2)) AS BIGINT) AS total_chars,
           COUNT(DISTINCT text2) AS n_distinct
    FROM (SELECT source, 'He said "hi"' || chr(10) || text AS text2
          FROM documents)
    GROUP BY source
    """,
    doc="S5/K2 CSV parity: text with embedded quotes and newlines survives "
    "a distributed CSV write (quote/escape '\"') + multiLine read with "
    "explicit schema — the reference's inferSchema double-scan "
    "eliminated (SURVEY.md §4). Aggregates prove byte integrity against "
    "DuckDB reading the original parquet.",
)
def csv_roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.concat(F.lit('He said "hi"\n'), F.col("text")).alias("text2"),
    )
    # per-process suffix: two concurrent sessions on the same sf_dir (the
    # driver sweep + pytest) must not race one overwrite-vs-read directory;
    # the process removes its own directory at exit so repeated CI runs
    # don't accumulate one parquet copy per pid (review r03)
    path = (
        "/tmp/spark_graft_csv_rt_"
        + hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
        + f"_{os.getpid()}"
    )
    if path not in _CSV_RT_CLEANUP:
        import atexit
        import shutil

        _CSV_RT_CLEANUP.add(path)
        atexit.register(shutil.rmtree, path, True)
    (
        d.write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    back = (
        spark.read.schema("source STRING, text2 STRING")
        .option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    return back.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text2")).alias("total_chars"),
        F.count_distinct("text2").alias("n_distinct"),
    )


ZBITS = 16  # bits interleaved per dimension → 32-bit z-key


def _o_zkey(a: str, b: str) -> str:
    """Oracle twin of the bit-interleave below (identical integer ops)."""
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


@register(
    "zorder_key_orders",
    f"""
    WITH base AS (
      SELECT o_orderkey,
             o_custkey % 65536 AS a,
             (CAST(epoch(o_orderdate) AS BIGINT) // 86400) % 65536 AS b
      FROM orders)
    SELECT o_orderkey, CAST({_o_zkey("a", "b")} AS BIGINT) AS zkey
    FROM base
    """,
    doc="Z-order (Morton) layout key over (customer, order-day): bit-"
    "interleaving the two dimensions so a sortWithinPartitions on zkey "
    "clusters rows for row-group min/max skipping on BOTH columns at "
    "once — the multi-dimensional data-skipping layout single-column "
    "sort can't give (the OPTIMIZE ZORDER primitive, as a plain "
    "deterministic expression). Pure integer bit ops, identical in both "
    "engines, zero shuffles.",
)
def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = (F.col("o_custkey") % 65536).cast("long")
    b = (
        F.expr("unix_timestamp(o_orderdate) div 86400") % 65536
    ).cast("long")
    zkey = None
    for i in range(ZBITS):
        ta = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        tb = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        term = ta.bitwiseOR(tb)
        zkey = term if zkey is None else zkey.bitwiseOR(term)
    return o.select("o_orderkey", zkey.cast("long").alias("zkey"))


@register(
    "table_checksum_orders",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(CAST({O.stable_int32(
               "o_orderkey || '|' || o_custkey || '|' || "
               "CAST(round(o_totalprice * 10000) AS BIGINT) || '|' || "
               "o_orderpriority || '|' || CAST(o_orderdate AS VARCHAR)"
           )} AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
    FROM orders
    """,
    doc="Order-independent table checksum: md5-int of each row's "
    "canonical string (money micro-scaled so doubles never print), "
    "summed in DECIMAL(38,0) — commutative, so any partitioning/"
    "replica computes the same digest. The replication/migration "
    "verification audit (compare source and destination without "
    "moving either). One map-side-combinable aggregate.",
)
def table_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.functions.hashing import stable_int32

    o = _t(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.round(F.col("o_totalprice") * 10000).cast("long").cast("string"),
        F.col("o_orderpriority"),
        F.col("o_orderdate").cast("string"),
    )
    return o.agg(
        F.count("*").alias("n_rows"),
        # stringified: DuckDB DECIMAL lands in pandas as float64, which
        # would diverge in repr; exact digits compare as text (memory:
        # HUGEINT/decimal → float64 trap)
        F.sum(stable_int32(canon).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("checksum"),
    )


@register(
    "runtime_filter_join_revenue",
    """
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           round(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4)
             AS total_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
    doc="Big-big join with a selective dim-side filter — the shape where "
    "neither side broadcasts at 100 TB and Spark's RUNTIME BLOOM FILTER "
    "is the scale lever: the optimizer aggregates the filtered orders "
    "keys into a bloom sketch and injects might_contain(xxhash64(l_"
    "orderkey)) into the lineitem scan, pruning most of the fact "
    "shuffle before it is written (the dynamic-filtering analog of "
    "Trino/Photon). The query itself is a PLAIN declarative join — no "
    "hints — so Catalyst picks broadcast at test scale and the bloom "
    "regime exactly when the scan-size thresholds warrant it; "
    "tests/test_plans.py::test_runtime_bloom_filter_fires_in_big_big_regime "
    "pins that regime by emulating it (broadcast off, thresholds down) "
    "and asserts BloomFilterMightContain + result equality. Oracle is "
    "the same join unfiltered by any sketch — the bloom is provably "
    "semantics-free (false positives only pass extra rows to the exact "
    "hash join behind it).",
)
def runtime_filter_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast(
                    "double"
                ),
                4,
            ).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Dynamic partition pruning: the lever that keeps a date-partitioned
# 100 TB fact scan from reading every partition when the filter lives on
# a joined dim. The fact is written partitionBy(d); the dim maps each
# day to its day-of-month; the query filters the DIM (dom <= 10) — a
# predicate Catalyst cannot statically push into the fact — and DPP
# injects the runtime subquery `d IN (broadcasted dim keys)` into the
# fact scan's PartitionFilters (gate:
# tests/test_plans.py::test_dpp_prunes_partitioned_fact_scan).

_DPP_CLEANUP: set[str] = set()
DPP_DOM_MAX = 10


def _dpp_paths(sf_dir: str) -> tuple[str, str]:
    base = (
        "/tmp/spark_graft_dpp_"
        + hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
        + f"_{os.getpid()}"
    )
    return base + "/fact", base + "/dim"


@register(
    "dpp_pruned_daily_events",
    f"""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
             AS total_value
    FROM events
    WHERE day(CAST(ts AS DATE)) <= {DPP_DOM_MAX}
    GROUP BY event_type
    """,
    doc="Dynamic partition pruning end-to-end: events re-written "
    "partitionBy(day), a (day -> day-of-month) dim written beside it, "
    "then fact join filtered-dim — the filter exists only in dim data, "
    "so static pushdown is impossible and Spark's DPP rule injects the "
    "runtime `d IN <broadcast keys>` subquery into the fact scan's "
    "PartitionFilters, reading ~1/3 of the partitions (the 100 TB "
    "date-partition prune; plan-gated). Oracle computes the same "
    "day-of-month filter straight from the original parquet — the "
    "round-trip plus pruning is provably semantics-free.",
)
def dpp_pruned_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.plans.queries import _t as _load

    fact_path, dim_path = _dpp_paths(sf_dir)
    if fact_path not in _DPP_CLEANUP:
        import atexit
        import shutil

        ev = _load(spark, sf_dir, "events").withColumn(
            "d", F.to_date("ts").cast("string")
        )
        ev.write.mode("overwrite").partitionBy("d").parquet(fact_path)
        (
            ev.select("d")
            .distinct()
            .withColumn("dom", F.dayofmonth(F.to_date("d")))
            .write.mode("overwrite")
            .parquet(dim_path)
        )
        _DPP_CLEANUP.add(fact_path)
        atexit.register(shutil.rmtree, fact_path.rsplit("/", 1)[0], True)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("dom") <= DPP_DOM_MAX)
    return (
        fact.join(F.broadcast(dim), "d")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join: the pay-the-shuffle-once layout for fact-fact
# joins that repeat across a pipeline. Both sides are bucketed by the
# join key into the same bucket count at write time; every later join on
# that key reads co-located buckets with NO exchange on either side
# (gate: tests/test_io.py::test_bucketed_join_is_exchange_free pins the
# plan on the operator; this registry entry pins result parity through
# the full write -> catalog -> join -> agg path).

_BUCKET_CLEANUP: set[str] = set()
N_BUCKETS = 8


@register(
    "bucketed_join_order_lines",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 4)
             AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc=f"Bucketed fact-fact join: orders and lineitem re-written "
    f"bucketBy({N_BUCKETS}, orderkey) + sortBy, then joined WITHOUT any "
    "exchange — the SortMergeJoin reads co-located, pre-sorted buckets "
    "on both sides (broadcast disabled for the join to pin the big-big "
    "regime). At 100 TB this converts every repeated orders-lineitem "
    "join in the pipeline (q3/q4/q10/q12/q18/q21 shapes) from a "
    "2-sided shuffle into a zero-shuffle scan; oracle is the plain "
    "unbucketed join — layout is provably semantics-free.",
)
def bucketed_join_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.io import write_bucketed
    from qa_data_pipeline_rag_llm_spark.plans.queries import _t as _load

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10] + f"_{os.getpid()}"
    base = f"/tmp/spark_graft_bkt_{tag}"
    t_orders, t_lines = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    # cache guard keyed on CATALOG state, not a module-level set: table
    # registrations are session-scoped, so a second SparkSession in this
    # process must re-register even though the parquet exists (advice r04)
    if not (
        spark.catalog.tableExists(t_orders)
        and spark.catalog.tableExists(t_lines)
    ):
        import atexit
        import shutil

        if base not in _BUCKET_CLEANUP:
            _BUCKET_CLEANUP.add(base)
            atexit.register(shutil.rmtree, base, True)
        else:
            shutil.rmtree(base, True)  # stale files from a dead session
        write_bucketed(
            _load(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority"
            ),
            t_orders,
            bucket_by=["o_orderkey"],
            n_buckets=N_BUCKETS,
            sort_by=["o_orderkey"],
            path=f"{base}/orders",
        )
        write_bucketed(
            _load(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice"
            ),
            t_lines,
            bucket_by=["l_orderkey"],
            n_buckets=N_BUCKETS,
            sort_by=["l_orderkey"],
            path=f"{base}/lineitem",
        )
    o = spark.table(t_orders)
    li = spark.table(t_lines)
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                    "double"
                ),
                4,
            ).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# AQE skew-join split: the AUTOMATIC twin of the explicit salting pair
# above. salted_join_event_revenue pays the salt in the plan; AQE's
# OptimizeSkewedJoin instead splits an oversized shuffle partition into
# sub-reads at runtime and replicates the matching build-side partition —
# no plan rewrite, works on joins written naively. SCALING.md claims the
# rule is armed session-wide; this query + its plan gate
# (tests/test_plans.py::test_aqe_splits_skewed_join) prove it fires.

SKEW_HOT_MOD = 10   # user_id % 10 < 7  → ~70% of rows share one key
SKEW_COLD_MOD = 97
_SKEWDIM_CLEANUP: set[str] = set()


def _skew_key(col):
    return (
        F.when((F.col(col) % SKEW_HOT_MOD) < 7, F.lit(-1))
        .otherwise(F.col(col) % SKEW_COLD_MOD)
        .alias("skew_key")
    )


_O_SKEW_KEY = (
    f"CASE WHEN user_id % {SKEW_HOT_MOD} < 7 THEN -1 "
    f"ELSE user_id % {SKEW_COLD_MOD} END"
)


@register(
    "aqe_skew_join_events",
    f"""
    WITH keyed AS (
      SELECT {_O_SKEW_KEY} AS skew_key, event_type, value FROM events),
    dim AS (
      SELECT skew_key,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS key_value,
             COUNT(*) AS key_rows
      FROM keyed GROUP BY skew_key)
    SELECT k.event_type,
           COUNT(*) AS n,
           round(CAST(SUM(CAST(d.key_value AS DECIMAL(18,6))) AS DOUBLE), 4)
             AS total_key_value
    FROM keyed k JOIN dim d ON k.skew_key = d.skew_key
    GROUP BY k.event_type
    """,
    doc="AQE skew-join split, end-to-end: a synthetic 70%%-hot join key "
    "(user_id folded so one key owns most rows) joined against its "
    "materialized per-key profile — written as a NAIVE equi-join, no "
    "salting. At runtime AQE detects the oversized shuffle partition "
    "and splits it into sub-reads with a replicated build side (plan "
    "gate asserts isSkewJoin under lowered thresholds; at 100 TB the "
    "defaults arm at 256 MB/partition). The automatic twin of "
    "salted_join_event_revenue — same hot-key problem, zero plan "
    "surgery; oracle is the plain join, so the split is provably "
    "semantics-free. The dim is a parquet table (not an inline agg) "
    "because OptimizeSkewedJoin only matches plain "
    "Sort(ShuffleQueryStage) join children — an aggregate directly "
    "under the join defeats the rewrite, a real planning constraint "
    "worth pinning.",
)
def aqe_skew_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.plans.queries import _t as _load

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10] + f"_{os.getpid()}"
    dim_path = f"/tmp/spark_graft_skewdim_{tag}"
    if dim_path not in _SKEWDIM_CLEANUP:
        import atexit
        import shutil

        (
            _load(spark, sf_dir, "events")
            .select(_skew_key("user_id"), "value")
            .groupBy("skew_key")
            .agg(
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("key_value"),
                F.count("*").alias("key_rows"),
            )
            .write.mode("overwrite")
            .parquet(dim_path)
        )
        _SKEWDIM_CLEANUP.add(dim_path)
        atexit.register(shutil.rmtree, dim_path, True)
    # the repartition stands in for the thousands-of-map-tasks input a
    # real fact table has, and is what GIVES AQE the mapper granularity
    # to split the hot partition: a skewed reduce partition is split
    # into per-mapper-range sub-reads, so a single-mapper shuffle (the
    # one-file local scan) is unsplittable no matter how skewed.
    # Semantics-free (hash distribution by the row id).
    ev = (
        _t(spark, sf_dir, "events")
        .select(_skew_key("user_id"), "event_type", "value", "event_id")
        .repartition(32, "event_id")
        .drop("event_id")
    )
    dim = spark.read.parquet(dim_path)
    return (
        ev.join(dim, "skew_key")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("key_value").cast("decimal(18,6)")).cast("double"),
                4,
            ).alias("total_key_value"),
        )
    )


# ---------------------------------------------------------------------------
# Nested schema pruning: at 100 TB fact tables carry wide structs
# (request context, device profile, experiment payload); a query touching
# one leaf must not deserialize the whole struct. Spark prunes nested
# fields into the parquet ReadSchema (nestedSchemaPruning, on by
# default) — but only if the plan stays declarative; gate:
# tests/test_plans.py::test_nested_struct_scan_prunes_to_leaf.

_NESTED_CLEANUP: set[str] = set()


def _nested_path(sf_dir: str) -> str:
    return (
        "/tmp/spark_graft_nested_"
        + hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
        + f"_{os.getpid()}"
    )


@register(
    "nested_prune_events",
    """
    SELECT CAST(k % 10 AS BIGINT) AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS k_sum
    FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    WHERE k IS NOT NULL
    GROUP BY 1
    """,
    doc="Nested schema pruning end-to-end: events re-written with a wide "
    "ctx struct (the parsed payload plus two fat padding leaves), then "
    "aggregated touching ONLY ctx.k — the scan's ReadSchema must shrink "
    "to struct<k> (plan-gated), skipping the fat leaves' parquet pages "
    "entirely. The 100 TB lever for wide-struct fact tables: IO scales "
    "with the leaves you touch, not the struct you declared. Oracle "
    "computes k straight from the original JSON payload — the struct "
    "round-trip is provably lossless for the touched leaf.",
)
def nested_prune_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.plans.queries import _t as _load

    path = _nested_path(sf_dir)
    if path not in _NESTED_CLEANUP:
        import atexit
        import shutil

        ev = _load(spark, sf_dir, "events")
        (
            ev.select(
                "event_id",
                F.struct(
                    F.get_json_object("props", "$.k")
                    .cast("bigint")
                    .alias("k"),
                    # fat leaves a pruned scan must never read
                    F.repeat(F.coalesce(F.col("props"), F.lit("")), 20).alias(
                        "payload"
                    ),
                    F.repeat(F.col("event_type"), 50).alias("trace"),
                ).alias("ctx"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
        _NESTED_CLEANUP.add(path)
        atexit.register(shutil.rmtree, path, True)
    t = spark.read.parquet(path)
    return (
        t.filter(F.col("ctx.k").isNotNull())
        .groupBy((F.col("ctx.k") % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum("ctx.k").cast("bigint").alias("k_sum"),
        )
    )
