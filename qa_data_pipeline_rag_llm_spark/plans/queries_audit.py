"""Registry entries: cross-table data-quality auditing + incremental
aggregate maintenance.

The operational pair every production warehouse runs nightly (extension
surface; the reference has no integrity checking at all — its ingest
silently trusts API payloads, ``/root/reference/REDDIT-Ingestion.py``):

  * ``integrity_audit_tables`` — a dbt-test-style suite of PK-uniqueness,
    FK-orphan, child-coverage, temporal-consistency, completeness and
    domain checks, emitted as one row per check so a scheduler can alert
    on ``pass = false``.
  * ``incremental_agg_merge_events`` — incremental view maintenance for a
    decomposable aggregate: partial-aggregate the historical and delta
    partitions separately, then MERGE the partials. The oracle recomputes
    from scratch over the full table, proving merge ≡ recompute — the
    algebraic property that lets a 100 TB rollup update by touching only
    the new partition.

Scale notes: every audit check is one linear scan or one key-shuffled
anti/equi join (no pair blowups); the audit unions 7 one-row aggregates.
The IVM merge re-aggregates one row per (user, side) — the merge input is
bounded by group cardinality, not event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register

# Day-of-month boundary between the "historical" and "delta" partitions of
# events (spans 2024-01-01..2024-01-30; <=20 puts ~2/3 in history).
IVM_CUTOFF_DAY = 20


def _check(df: DataFrame, check_name: str, table_name: str, violations: F.Column) -> DataFrame:
    return df.agg(violations.cast("long").alias("n_violations")).select(
        F.lit(check_name).alias("check_name"),
        F.lit(table_name).alias("table_name"),
        "n_violations",
        (F.col("n_violations") == 0).alias("pass"),
    )


@register(
    "integrity_audit_tables",
    """
    WITH checks AS (
      SELECT 'pk_unique' AS check_name, 'orders' AS table_name,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'pk_unique', 'customer',
             CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
      FROM customer
      UNION ALL
      SELECT 'fk_orphan_custkey', 'orders',
             CAST(COUNT(*) AS BIGINT)
      FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'fk_orphan_orderkey', 'lineitem',
             CAST(COUNT(*) AS BIGINT)
      FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'childless_order', 'orders',
             CAST(COUNT(*) AS BIGINT)
      FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      UNION ALL
      SELECT 'ship_before_order', 'lineitem',
             CAST(COUNT(*) AS BIGINT)
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate < o.o_orderdate
      UNION ALL
      SELECT 'null_text', 'documents',
             CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM documents)
    SELECT check_name, table_name, n_violations,
           n_violations = 0 AS pass
    FROM checks
    """,
    doc="dbt-test-style integrity suite over the warehouse: PK "
    "uniqueness, FK orphans (both directions of the orders⋈customer / "
    "lineitem⋈orders spine), childless parents, temporal consistency "
    "(shipped before ordered), and completeness — one row per check "
    "with a pass flag. Each check is one linear scan or one key-"
    "shuffled semi/anti join; the union glues 7 one-row aggregates.",
)
def integrity_audit_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")
    documents = _t(spark, sf_dir, "documents")

    pk_orders = _check(
        orders,
        "pk_unique",
        "orders",
        F.count("*") - F.countDistinct("o_orderkey"),
    )
    pk_customer = _check(
        customer,
        "pk_unique",
        "customer",
        F.count("*") - F.countDistinct("c_custkey"),
    )
    fk_cust = _check(
        orders.join(
            customer,
            orders["o_custkey"] == customer["c_custkey"],
            "left_anti",
        ),
        "fk_orphan_custkey",
        "orders",
        F.count("*"),
    )
    fk_order = _check(
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
            "left_anti",
        ),
        "fk_orphan_orderkey",
        "lineitem",
        F.count("*"),
    )
    childless = _check(
        orders.join(
            lineitem.select("l_orderkey"),
            orders["o_orderkey"] == lineitem["l_orderkey"],
            "left_anti",
        ),
        "childless_order",
        "orders",
        F.count("*"),
    )
    ship_before = _check(
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            lineitem["l_orderkey"] == orders["o_orderkey"],
        ).filter(F.col("l_shipdate") < F.col("o_orderdate")),
        "ship_before_order",
        "lineitem",
        F.count("*"),
    )
    null_text = _check(
        documents,
        "null_text",
        "documents",
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)),
    )
    out = pk_orders
    for c in (pk_customer, fk_cust, fk_order, childless, ship_before, null_text):
        out = out.unionByName(c)
    return out


@register(
    "incremental_agg_merge_events",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
             AS total_value
    FROM events GROUP BY user_id
    """,
    doc="Incremental view maintenance for a decomposable per-user rollup: "
    "history (day ≤ 20) and delta (day > 20) are partial-aggregated "
    "SEPARATELY, then merged by summing partials — the oracle "
    "recomputes from the full table, proving merge ≡ recompute. "
    "Decimal partials keep the merge bit-exact regardless of how rows "
    "were split, which is the property that lets a planet-scale rollup "
    "absorb a new partition without re-reading history.",
)
def incremental_agg_merge_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
        )

    hist = partial(ev.filter(F.dayofmonth("ts") <= IVM_CUTOFF_DAY))
    delta = partial(ev.filter(F.dayofmonth("ts") > IVM_CUTOFF_DAY))
    return (
        hist.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.sum("pn").alias("n_events"),
            F.round(F.sum("pv").cast("double"), 4).alias("total_value"),
        )
    )


SKEW_TOP_N = 20


@register(
    "skew_profile_events",
    f"""
    WITH counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id),
    ranked AS (
      SELECT user_id, n,
             round(n * 1.0 / SUM(n) OVER (), 6) AS share,
             ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS heavy_rank
      FROM counts)
    SELECT user_id, n, share, CAST(heavy_rank AS INTEGER) AS heavy_rank
    FROM ranked WHERE heavy_rank <= {SKEW_TOP_N}
    """,
    doc="Shuffle-skew diagnostic: the top-N heaviest join/agg keys with "
    "their row share — the measurement that decides whether a key needs "
    "salting (operators/skew.py) or AQE skew-split suffices. One "
    "map-side-combinable count; the window runs over the already-"
    "aggregated key frame.",
)
def skew_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    # total row count is a one-row aggregate broadcast back (NOT a global
    # window over every key), and the top-N select is orderBy+limit →
    # TakeOrderedAndProject, so the rank window only ever sees N rows
    # (VERDICT r02 #1: the key frame grows with the data).
    total = counts.agg(F.sum("n").alias("_total"))
    top = counts.orderBy(F.desc("n"), "user_id").limit(SKEW_TOP_N)
    rank = F.row_number().over(Window.orderBy(F.desc("n"), "user_id"))
    return top.crossJoin(F.broadcast(total)).select(
        "user_id",
        "n",
        F.round(F.col("n") * 1.0 / F.col("_total"), 6).alias("share"),
        rank.cast("int").alias("heavy_rank"),
    )


@register(
    "curation_decisions_documents",
    None,  # composed oracle injected below (needs sibling REGISTRY oracles)
    doc="The curator's FINAL verdict table: per doc, the Gopher rule "
    "gate, the span-duplication flag, and the near-dup prune decision "
    "joined into one keep/drop row with a first-failing-reason label — "
    "what actually ships to the training-mix builder. Pure composition "
    "of three oracle-checked plans; the joins are 1:1 on doc_id. NOTE "
    "on survivor semantics: each gate is an INDEPENDENT column here, "
    "so the dedup survivor is the cluster's min id regardless of the "
    "rule gate (a cluster whose min-id copy fails rules drops "
    "entirely); api.curate implements the rule-aware alternative "
    "(survivor = min id among rule-passing members) for callers who "
    "want recoverable duplicates kept (advice r09).",
)
def curation_decisions_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY

    g = (
        REGISTRY["gopher_quality_documents"]
        .spark(spark, sf_dir)
        .select("doc_id", F.col("keep").alias("rule_keep"))
    )
    s = (
        REGISTRY["span_dup_fraction_documents"]
        .spark(spark, sf_dir)
        .select("doc_id", F.col("flagged").alias("span_flagged"))
    )
    p = (
        REGISTRY["near_dup_prune_documents"]
        .spark(spark, sf_dir)
        .select("doc_id", F.col("kept").alias("dedup_kept"))
    )
    joined = g.join(s, "doc_id").join(p, "doc_id")
    reason = (
        F.when(~F.col("rule_keep"), "quality")
        .when(F.col("span_flagged"), "span_dup")
        .when(~F.col("dedup_kept"), "near_dup")
        .otherwise("keep")
    )
    return joined.select(
        "doc_id",
        "rule_keep",
        "span_flagged",
        "dedup_kept",
        (
            F.col("rule_keep")
            & ~F.col("span_flagged")
            & F.col("dedup_kept")
        ).alias("keep"),
        reason.alias("reason"),
    )


from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY  # noqa: E402

REGISTRY["curation_decisions_documents"].oracle = f"""
    WITH g AS (
      SELECT doc_id, keep AS rule_keep
      FROM ({REGISTRY["gopher_quality_documents"].oracle})),
    s AS (
      SELECT doc_id, flagged AS span_flagged
      FROM ({REGISTRY["span_dup_fraction_documents"].oracle})),
    p AS (
      SELECT doc_id, kept AS dedup_kept
      FROM ({REGISTRY["near_dup_prune_documents"].oracle}))
    SELECT g.doc_id, rule_keep, span_flagged, dedup_kept,
           rule_keep AND NOT span_flagged AND dedup_kept AS keep,
           CASE WHEN NOT rule_keep THEN 'quality'
                WHEN span_flagged THEN 'span_dup'
                WHEN NOT dedup_kept THEN 'near_dup'
                ELSE 'keep' END AS reason
    FROM g JOIN s ON g.doc_id = s.doc_id
           JOIN p ON g.doc_id = p.doc_id
"""


@register(
    "curation_funnel_documents",
    None,  # composed oracle injected below
    doc="Curation YIELD report, one row: SEQUENTIAL survivors at each "
    "gate (pass_rules ⊇ pass_span ⊇ pass_dedup = n_keep — each count is "
    "docs surviving that gate AND every gate before it, so the funnel "
    "is monotone and a stage's drop is exactly the difference to its "
    "left) plus the final keep rate — the number a data lead actually "
    "reads before a training run, and the regression canary for any "
    "gate-threshold change. One aggregate over the composed verdict "
    "table; boolean sums are exact.",
)
def curation_funnel_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = REGISTRY["curation_decisions_documents"].spark(spark, sf_dir)
    n = F.count("*")
    return d.agg(
        n.cast("long").alias("n_docs"),
        F.sum(F.col("rule_keep").cast("long")).alias("pass_rules"),
        F.sum(
            (F.col("rule_keep") & ~F.col("span_flagged")).cast("long")
        ).alias("pass_span"),
        F.sum(
            (
                F.col("rule_keep")
                & ~F.col("span_flagged")
                & F.col("dedup_kept")
            ).cast("long")
        ).alias("pass_dedup"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.round(F.sum(F.col("keep").cast("long")) * 1.0 / n, 6).alias(
            "keep_rate"
        ),
    )


REGISTRY["curation_funnel_documents"].oracle = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rule_keep THEN 1 ELSE 0 END) AS BIGINT)
             AS pass_rules,
           CAST(SUM(CASE WHEN rule_keep AND NOT span_flagged
                     THEN 1 ELSE 0 END) AS BIGINT)
             AS pass_span,
           CAST(SUM(CASE WHEN rule_keep AND NOT span_flagged AND dedup_kept
                     THEN 1 ELSE 0 END) AS BIGINT)
             AS pass_dedup,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           round(SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS keep_rate
    FROM ({REGISTRY["curation_decisions_documents"].oracle})
"""


# ---------------------------------------------------------------------------
# Privacy / re-identification audit (extension surface: a training-data
# release must check quasi-identifier uniqueness before shipping; the
# reference publishes scraped user content with no such check —
# REDDIT-Ingestion.py ships author-adjacent fields as-is).

K_ANON_K = 5  # the classic "k≥5" release bar


@register(
    "k_anonymity_customers",
    f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS INTEGER) AS bal_band,
             COUNT(*) AS cnt
      FROM customer
      GROUP BY c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS INTEGER))
    SELECT CAST({K_ANON_K} AS INTEGER) AS k,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           COUNT(*) AS n_groups,
           CAST(MIN(cnt) AS BIGINT) AS k_min,
           CAST(SUM(CASE WHEN cnt < {K_ANON_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_lt_k,
           CAST(SUM(CASE WHEN cnt < {K_ANON_K} THEN cnt ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           round(SUM(CASE WHEN cnt < {K_ANON_K} THEN cnt ELSE 0 END)
                 / CAST(SUM(cnt) AS DOUBLE), 6) AS risk_share
    FROM g
    """,
    doc=f"k-anonymity audit (k={K_ANON_K}) over the quasi-identifier "
    "tuple (nation, market segment, account-balance band): group sizes "
    "→ one-row report with the achieved k_min, the number of violating "
    "groups, and the share of rows re-identifiable at k<5 — the release "
    "gate a curated dataset needs before publication. Two partial-agg "
    "friendly aggregations, no window, no join: at 100 TB this is one "
    "QI-key shuffle plus a one-row reduce.",
)
def k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_band"),
    ).agg(F.count("*").alias("cnt"))
    risk = F.sum(F.when(F.col("cnt") < K_ANON_K, F.col("cnt")).otherwise(0))
    return g.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_groups"),
        F.min("cnt").alias("k_min"),
        F.sum(
            F.when(F.col("cnt") < K_ANON_K, 1).otherwise(0)
        ).alias("groups_lt_k"),
        risk.alias("rows_at_risk"),
        F.round(risk / F.sum("cnt").cast("double"), 6).alias("risk_share"),
    ).select(
        F.lit(K_ANON_K).cast("int").alias("k"),
        "n_rows",
        "n_groups",
        "k_min",
        "groups_lt_k",
        "rows_at_risk",
        "risk_share",
    )


@register(
    "vector_store_audit",
    """
    WITH refd AS (SELECT MAX(len(embedding)) AS d FROM embeddings),
    checks AS (
      SELECT 'doc_missing_vector' AS check_name, 'documents' AS table_name,
             CAST(COUNT(*) AS BIGINT) AS n_violations
      FROM documents d WHERE NOT EXISTS
        (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
      UNION ALL
      SELECT 'orphan_vector', 'embeddings', CAST(COUNT(*) AS BIGINT)
      FROM embeddings e WHERE NOT EXISTS
        (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)
      UNION ALL
      SELECT 'null_embedding', 'embeddings',
             CAST(SUM(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM embeddings
      UNION ALL
      SELECT 'dim_inconsistent', 'embeddings',
             CAST(SUM(CASE WHEN len(embedding) != (SELECT d FROM refd)
                      THEN 1 ELSE 0 END) AS BIGINT)
      FROM embeddings
      UNION ALL
      SELECT 'zero_vector', 'embeddings',
             CAST(SUM(CASE WHEN list_dot_product(
                             CAST(embedding AS DOUBLE[]),
                             CAST(embedding AS DOUBLE[])) = 0
                      THEN 1 ELSE 0 END) AS BIGINT)
      FROM embeddings)
    SELECT check_name, table_name, n_violations,
           n_violations = 0 AS pass
    FROM checks
    """,
    doc="RAG-store health audit, one row per check: every document has "
    "a vector (anti-join), no orphan vectors, no NULL embeddings, all "
    "dimensions agree with the corpus-wide reference dim, no zero-norm "
    "vectors (cosine-undefined — the rows safe_denom currently shields "
    "at query time). The pre-serving gate the reference's rebuild-"
    "everything upsert (app2.py) never runs. Each check is a linear "
    "scan or one key-shuffled anti join; the dim reference is a one-row "
    "broadcast.",
)
def vector_store_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.functions.vectors import dot

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    missing = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_anti"
    )
    orphan = emb.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_anti"
    )
    refd = emb.agg(F.max(F.size("embedding")).alias("_d"))
    dimj = emb.crossJoin(F.broadcast(refd))
    checks = [
        _check(missing, "doc_missing_vector", "documents", F.count("*")),
        _check(orphan, "orphan_vector", "embeddings", F.count("*")),
        _check(
            emb,
            "null_embedding",
            "embeddings",
            F.sum(
                F.when(F.col("embedding").isNull(), 1).otherwise(0)
            ),
        ),
        _check(
            dimj,
            "dim_inconsistent",
            "embeddings",
            F.sum(
                F.when(
                    F.size("embedding") != F.col("_d"), 1
                ).otherwise(0)
            ),
        ),
        _check(
            emb,
            "zero_vector",
            "embeddings",
            F.sum(
                F.when(
                    dot("embedding", "embedding") == 0, 1
                ).otherwise(0)
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# l-diversity bar: each QI group must span >= 3 distinct sensitive
# values, the usual companion to the k>=5 anonymity gate above.
L_DIV_L = 3


@register(
    "l_diversity_customers",
    f"""
    WITH cells AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000) AS INTEGER) AS bal_band,
             c_mktsegment, COUNT(*) AS cnt
      FROM customer
      GROUP BY c_nationkey,
               CAST(floor(c_acctbal / 1000) AS INTEGER), c_mktsegment),
    g AS (
      SELECT c_nationkey, bal_band,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             COUNT(*) AS n_sens
      FROM cells GROUP BY c_nationkey, bal_band)
    SELECT CAST({L_DIV_L} AS INTEGER) AS l,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(n_sens) AS BIGINT) AS l_min,
           CAST(SUM(CASE WHEN n_sens < {L_DIV_L} THEN 1 ELSE 0 END)
                AS BIGINT) AS groups_lt_l,
           CAST(SUM(CASE WHEN n_sens < {L_DIV_L} THEN n_rows ELSE 0 END)
                AS BIGINT) AS rows_at_risk,
           round(SUM(CASE WHEN n_sens < {L_DIV_L} THEN n_rows ELSE 0 END)
                 / CAST(SUM(n_rows) AS DOUBLE), 6) AS risk_share
    FROM g
    """,
    doc=f"l-diversity audit (l={L_DIV_L}) — the homogeneity companion "
    "to k_anonymity_customers: a QI group can satisfy k>=5 yet leak "
    "the sensitive attribute outright when every member shares one "
    "value. QI = (nation, account-balance band), sensitive = market "
    "segment; distinct-sensitive counts come from a two-level groupBy "
    "(QI+sensitive cells, then QI) so both shuffles partial-aggregate "
    "— no countDistinct rewrite, no window. One-row release verdict: "
    "achieved l_min, violating groups, rows re-identifiable by "
    "homogeneity and their share. At 100 TB: one QI+sensitive-key "
    "shuffle that map-side combine absorbs, then a cells-sized reduce.",
)
def l_diversity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_band"),
        "c_mktsegment",
    ).agg(F.count("*").alias("cnt"))
    g = cells.groupBy("c_nationkey", "bal_band").agg(
        F.sum("cnt").alias("n_rows"), F.count("*").alias("n_sens")
    )
    risk = F.sum(
        F.when(F.col("n_sens") < L_DIV_L, F.col("n_rows")).otherwise(0)
    )
    return g.agg(
        F.count("*").alias("n_groups"),
        F.min("n_sens").alias("l_min"),
        F.sum(
            F.when(F.col("n_sens") < L_DIV_L, 1).otherwise(0)
        ).alias("groups_lt_l"),
        risk.alias("rows_at_risk"),
        F.round(risk / F.sum("n_rows").cast("double"), 6).alias(
            "risk_share"
        ),
    ).select(
        F.lit(L_DIV_L).cast("int").alias("l"),
        "n_groups",
        F.col("l_min").cast("long").alias("l_min"),
        "groups_lt_l",
        "rows_at_risk",
        "risk_share",
    )
