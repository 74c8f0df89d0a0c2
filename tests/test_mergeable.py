"""Mergeable-summary family (queries_mergeable.py): cross-engine
register parity, estimator branch coverage, and the merge property
itself — top-k-of-union == merge-of-top-k's, register-max associativity.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
from qa_data_pipeline_rag_llm_spark.plans.queries_mergeable import (
    _DUCK_BUCKET,
    _DUCK_W,
    _M,
    _RHO_MAX,
    _SPARK_BUCKET,
    _SPARK_W,
)
from tests.conftest import SF_DIR


def test_md5_register_parity_cross_engine(spark):
    """The (bucket, w, rho) triple — the entire sketch state — must be
    bit-identical between Spark and DuckDB for the same user_ids."""
    ids = list(range(0, 2000, 7)) + [2**40 + 3, 999_999_999_999]
    sdf = (
        spark.createDataFrame([(i,) for i in ids], "user_id long")
        .select(
            "user_id",
            F.expr(_SPARK_BUCKET).alias("bucket"),
            F.expr(_SPARK_W).alias("w"),
        )
        .orderBy("user_id")
        .collect()
    )
    con = duckdb.connect()
    ddf = con.execute(
        f"""
        SELECT user_id, {_DUCK_BUCKET} AS bucket, {_DUCK_W} AS w
        FROM (SELECT unnest(?) AS user_id) ORDER BY user_id
        """,
        [ids],
    ).fetchall()
    for s, d in zip(sdf, ddf):
        assert (s.user_id, s.bucket, s.w) == d
        assert 0 <= s.bucket < _M
        assert 0 <= s.w < 1 << 60


def test_hll_within_budget_both_branches(spark):
    """sf0.001/sf0.01 exercise the linear-counting branch, sf0.1 the raw
    estimator (checked via empty_registers); all rows stay in budget."""
    rows = REGISTRY["hll_union_users_events"].spark(spark, SF_DIR).collect()
    assert all(r.within_budget for r in rows)
    scopes = {r.scope for r in rows}
    assert "ALL" in scopes and len(scopes) == 6


def test_hll_register_merge_is_associative(spark):
    """The union proof the ALL scope relies on: max-merging per-type
    register vectors must equal the registers computed over the union of
    rows directly — on real data, not synthetic."""
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
    )
    w = F.expr(_SPARK_W)
    rho = ev.select(
        "event_type",
        F.expr(_SPARK_BUCKET).alias("bucket"),
        F.when(w == 0, F.lit(_RHO_MAX))
        .otherwise(F.lit(_RHO_MAX) - F.length(F.bin(w)))
        .alias("r"),
    )
    merged = (
        rho.groupBy("event_type", "bucket")
        .agg(F.max("r").alias("m"))
        .groupBy("bucket")
        .agg(F.max("m").alias("m"))
    )
    direct = rho.groupBy("bucket").agg(F.max("r").alias("m"))
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_reservoir_topk_is_mergeable(spark):
    """A-ExpJ's scale story: top-k over the full corpus == top-k of the
    union of per-half top-k's. Split documents by doc_id parity, take
    each half's per-source top-20 by the same deterministic key, merge,
    re-rank — must equal the registered query's output exactly."""
    full = (
        REGISTRY["weighted_reservoir_documents"]
        .spark(spark, SF_DIR)
        .orderBy("source", "rank")
        .collect()
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
        F.col("n_chars") > 0
    )
    u_num = (
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 3, 15), 16, 10)"
            " AS BIGINT)"
        )
        + 1
    )
    key = F.log(u_num.cast("double") / F.lit(float(1 << 60))) / F.col(
        "n_chars"
    )
    from pyspark.sql import Window

    halves = []
    for parity in (0, 1):
        half = docs.where(F.pmod(F.col("doc_id"), F.lit(2)) == parity)
        w_ = Window.partitionBy("source").orderBy(
            F.col("__k").desc(), "doc_id"
        )
        halves.append(
            half.withColumn("__k", key)
            .withColumn("__r", F.row_number().over(w_))
            .where(F.col("__r") <= 20)
            .drop("__r")
        )
    w_ = Window.partitionBy("source").orderBy(F.col("__k").desc(), "doc_id")
    remerged = (
        halves[0]
        .unionByName(halves[1])
        .withColumn("rank", F.row_number().over(w_))
        .where(F.col("rank") <= 20)
        .select(
            "source", "rank", "doc_id", F.col("n_chars").alias("weight")
        )
        .orderBy("source", "rank")
        .collect()
    )
    assert [tuple(r) for r in remerged] == [tuple(r) for r in full]


def test_streaming_hll_matches_batch_all_scope(spark):
    """The streaming register path must land on the SAME estimate as the
    batch union query's ALL scope — the state-store merge is the same
    max-merge as the batch shuffle."""
    stream = REGISTRY["streaming_hll_users"].spark(spark, SF_DIR).collect()
    batch = {
        r.scope: r
        for r in REGISTRY["hll_union_users_events"].spark(spark, SF_DIR).collect()
    }
    assert len(stream) == 1
    s, b = stream[0], batch["ALL"]
    assert (s.est_users, s.exact_users, s.empty_registers) == (
        b.est_users,
        b.exact_users,
        b.empty_registers,
    )
    assert s.within_budget


def test_deletion_cascade_is_consistent(spark):
    """Cascade invariants on real data: affected <= total everywhere,
    affected(customer) > 0, and the orders hit-rate tracks the customer
    cohort share (each order belongs to exactly one customer)."""
    rows = {
        r.tbl: r
        for r in REGISTRY["deletion_cascade_customers"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert set(rows) == {"customer", "orders", "lineitem"}
    for r in rows.values():
        assert 0 <= r.rows_affected <= r.rows_total
    assert rows["customer"].rows_affected > 0
    # ~5% cohort: orders pct within a loose band of the customer pct
    assert abs(rows["orders"].pct - rows["customer"].pct) < 5.0


def test_hll_overlap_tracks_exact_sets(spark):
    """Inclusion-exclusion sanity on real data: every union estimate in
    budget (HLL guarantee), and the intersection estimates must at
    least RANK pairs like the exact intersections do (Spearman-style
    sign check over all pairs — sketches are for triage, the ranking is
    what a curation pipeline consumes)."""
    rows = (
        REGISTRY["hll_vocab_overlap_by_source"]
        .spark(spark, SF_DIR)
        .collect()
    )
    assert all(r.union_within_budget for r in rows)
    # rank agreement: correlation of est_inter with exact_inter > 0
    n = len(rows)
    assert n >= 3
    ex = [r.exact_inter for r in rows]
    es = [r.est_inter for r in rows]
    mean_ex, mean_es = sum(ex) / n, sum(es) / n
    cov = sum((a - mean_ex) * (b - mean_es) for a, b in zip(ex, es))
    assert cov > 0  # positively correlated, not noise


def test_hll_rollup_window_registers_dominate_daily(spark):
    """The register-level invariant behind the rollup: the trailing
    window's register vector must dominate the ending day's registers
    bucket-for-bucket (max-merge can only raise registers). Checked at
    the REGISTER level, not the estimate level — the LC/raw estimator
    branch switch makes estimates non-monotone across the 2.5m cutoff,
    so an estimate comparison would be a latent flake (review r05).
    Every window row must also sit inside the error budget."""
    from qa_data_pipeline_rag_llm_spark.catalog import load_table
    from qa_data_pipeline_rag_llm_spark.operators import hll

    rows = (
        REGISTRY["hll_rollup_daily_users"].spark(spark, SF_DIR).collect()
    )
    assert rows and all(r.within_budget for r in rows)
    ev = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
    )
    regs = (
        ev.select("day", *hll.register_cols("user_id"))
        .groupBy("day", "bucket")
        .agg(F.max("r").alias("m_reg"))
        .collect()
    )
    daily: dict = {}
    for r in regs:
        daily.setdefault(str(r.day), {})[r.bucket] = r.m_reg
    import datetime as dt

    for day, dregs in daily.items():
        d0 = dt.date.fromisoformat(day)
        win: dict = {}
        for off in range(7):
            for b, m in daily.get(str(d0 - dt.timedelta(days=off)), {}).items():
                win[b] = max(win.get(b, 0), m)
        assert all(win.get(b, 0) >= m for b, m in dregs.items()), day


def test_cms_never_underestimates_and_cells_merge(spark):
    """CMS hard invariant (min-over-rows >= exact for EVERY probe) plus
    the merge property: cells built from two disjoint halves of events
    must SUM to the full-corpus cells (counter sketches merge by +)."""
    from qa_data_pipeline_rag_llm_spark.catalog import load_table
    from qa_data_pipeline_rag_llm_spark.operators import hll
    from qa_data_pipeline_rag_llm_spark.plans.queries_mergeable import (
        _CMS_D,
        _cms_key_sql,
    )

    rows = (
        REGISTRY["cms_user_counts_events"].spark(spark, SF_DIR).collect()
    )
    assert rows and all(r.never_underestimates for r in rows)

    ev = load_table(spark, SF_DIR, "events").where(
        F.col("user_id").isNotNull()
    )

    def cells_of(df):
        keyed = df.groupBy("user_id").agg(F.count("*").alias("n"))
        parts = [
            keyed.select(
                F.lit(r).alias("r"),
                F.expr(
                    hll.spark_bucket_sql(_cms_key_sql(r, "user_id"))
                ).alias("col"),
                "n",
            )
            for r in range(_CMS_D)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u.groupBy("r", "col").agg(F.sum("n").cast("long").alias("c"))

    full = {(r.r, r.col): r.c for r in cells_of(ev).collect()}
    h0 = cells_of(ev.where(F.pmod(F.col("event_id"), F.lit(2)) == 0))
    h1 = cells_of(ev.where(F.pmod(F.col("event_id"), F.lit(2)) == 1))
    merged: dict = {}
    for part in (h0.collect(), h1.collect()):
        for r in part:
            merged[(r.r, r.col)] = merged.get((r.r, r.col), 0) + r.c
    assert merged == full


def test_bloom_invariants_and_bit_merge(spark):
    """Bloom hard invariant (never a false negative) and the merge
    property: bits built from two disjoint halves of the key set,
    OR-merged (set union), must equal the full filter's bits."""
    from qa_data_pipeline_rag_llm_spark.catalog import load_table
    from qa_data_pipeline_rag_llm_spark.plans.queries_mergeable import (
        _BLOOM_K,
        _bloom_bit_sql,
    )

    row = (
        REGISTRY["bloom_membership_customers"].spark(spark, SF_DIR).first()
    )
    assert row.no_false_negatives and row.fp_within_budget
    # the offset-twin probes guarantee a non-degenerate non-member pool
    assert row.n_probes > row.n_members > 0
    orders = load_table(spark, SF_DIR, "orders").where(
        F.col("o_custkey").isNotNull()
    )
    members = orders.select(F.col("o_custkey").alias("k")).distinct()

    def bits_of(df):
        out = set()
        for r in range(_BLOOM_K):
            out |= {
                x.bit
                for x in df.select(
                    F.expr(_bloom_bit_sql(r, "k", "spark")).alias("bit")
                ).collect()
            }
        return out

    full = bits_of(members)
    h0 = bits_of(members.where(F.pmod(F.col("k"), F.lit(2)) == 0))
    h1 = bits_of(members.where(F.pmod(F.col("k"), F.lit(2)) == 1))
    assert (h0 | h1) == full


def test_reservoir_prefers_heavy_documents(spark):
    """Selection probability must actually track weight: the sampled
    docs' mean n_chars exceeds the corpus mean (size-biased sampling)."""
    sel = REGISTRY["weighted_reservoir_documents"].spark(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
        F.col("n_chars") > 0
    )
    m_sel = sel.agg(F.avg("weight")).first()[0]
    m_all = docs.agg(F.avg("n_chars")).first()[0]
    assert m_sel > m_all


def test_hll_final_union_scope_cannot_cross_match_real_ALL_label(spark):
    """ADVICE r05 (queries_mergeable.py:148): if a REAL group is
    literally named 'ALL', the est/ex join must key on (label,
    is_union) so the union scope's rows never fan out against it."""
    from qa_data_pipeline_rag_llm_spark.plans.queries_mergeable import (
        _hll_final,
    )

    est = spark.createDataFrame(
        [("ALL", 10.0, 3, False), ("ALL", 99.0, 1, True)],
        "event_type string, est double, v int, is_union boolean",
    )
    ex = spark.createDataFrame(
        [("ALL", 10, False), ("ALL", 100, True)],
        "event_type string, exact_users long, is_union boolean",
    )
    rows = _hll_final(est, ex, "event_type", extra_keys=["is_union"]).collect()
    assert len(rows) == 2  # no 4-row fan-out
    by_exact = {r.exact_users: r for r in rows}
    assert by_exact[10].est_users == 10.0  # real 'ALL' paired with itself
    assert by_exact[100].est_users == 99.0  # union scope with union exact
