"""Public facade: what a user of the reference calls after switching.

The reference exposes three entry points (SURVEY.md §3): the 7-script
batch ETL, the embed/cluster index build, and the per-chat-message RAG
serving flow (``/root/reference/app2.py:133-247`` — reload CSVs, embed
the question, Qdrant top-1, pandas point lookups + isin filters, prompt
Ollama). This module is that surface as a handful of composable
functions over DataFrames — each a thin parameterized veneer over the
operator library, so everything here inherits the oracle-checked
semantics of the underlying registry queries.

Determinism note: :func:`ask` runs with whatever embed/LLM backends are
configured (``functions/embed.py`` / ``functions/llm.py`` seams); the
defaults are the deterministic fakes, so tests can assert exact output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Re-exported pipeline stages (entry point 1: clean → rank → join → merge)
from qa_data_pipeline_rag_llm_spark.operators.clustering import (  # noqa: F401
    density_cluster,
    kmeans_assign,
    similar_items,
)
from qa_data_pipeline_rag_llm_spark.operators.joins import (  # noqa: F401
    enrich_with_child_ids,
)
from qa_data_pipeline_rag_llm_spark.operators.merge import (  # noqa: F401
    dedup_first,
    union_corpus,
)
from qa_data_pipeline_rag_llm_spark.operators.normalize import (  # noqa: F401
    normalize_reddit_comments,
    normalize_reddit_posts,
    normalize_stack_answers,
    normalize_stack_questions,
)
from qa_data_pipeline_rag_llm_spark.operators.ranking import (  # noqa: F401
    top_k_per_group,
)
from qa_data_pipeline_rag_llm_spark.operators.similarity import cosine_topk


def embed_corpus(
    df: DataFrame, text_col: str = "text", out_col: str = "embedding"
) -> DataFrame:
    """Entry point 2, step 1: add an embedding column via the configured
    backend (Arrow-batched; deterministic fake unless injected)."""
    from qa_data_pipeline_rag_llm_spark.functions.embed import embed_text

    return df.withColumn(out_col, embed_text(F.col(text_col)))


def retrieve(
    vectors: DataFrame,
    query_vector: list[float],
    k: int = 5,
    threshold: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Parameterized similarity retrieval (S7/M4): exact cosine top-k of an
    ARBITRARY query vector against the corpus, thresholded — app2.py:32-45
    without the fixed probe the registry demo uses. The query vector rides
    as a literal array (broadcast by construction, no driver math)."""
    spark = vectors.sparkSession
    # probe_id = -1: cosine_topk excludes id collisions (self-match when
    # probing with a corpus row); an external query vector must exclude
    # nothing, and corpus ids are non-negative
    probe = spark.createDataFrame(
        [(-1, [float(x) for x in query_vector])],
        "probe_id int, probe_vec array<double>",
    )
    out = cosine_topk(vectors, probe, k=k, id_col=id_col, vec_col=vec_col)
    return out.filter(F.col("sim") >= threshold).drop("probe_id")


def ask(
    spark: SparkSession,
    question: str,
    documents: DataFrame,
    k: int = 5,
    threshold: float = 0.0,
) -> DataFrame:
    """Entry point 3 as ONE plan (app2.py:133-247 per-message flow):
    embed the corpus AND the question with the same configured backend
    (one vector space — mixing a pre-built index from a different model
    with a fresh question embedding is the classic serving bug) →
    cosine top-k ≥ threshold → join context docs → rank-ordered
    grounded prompt → batched generation. Returns (n_docs,
    prompt_chars, answer). For a pre-computed index from the SAME
    backend, use :func:`retrieve` + your own prompt assembly."""
    from qa_data_pipeline_rag_llm_spark.functions.embed import embed_text
    from qa_data_pipeline_rag_llm_spark.functions.llm import generate_text

    vectors = documents.select(
        F.col("doc_id").alias("vec_id"), embed_text(F.col("text")).alias("embedding")
    )
    q = spark.createDataFrame([(question,)], "q string").select(
        F.lit(-1).alias("probe_id"), embed_text(F.col("q")).alias("probe_vec")
    )
    top = (
        cosine_topk(vectors, q, k=k)
        .filter(F.col("sim") >= threshold)
        .select("vec_id", "rank")
    )
    assembled = (
        top.join(documents.select("doc_id", "text"), top.vec_id == F.col("doc_id"))
        .groupBy()
        .agg(
            F.count("*").alias("n_docs"),
            F.concat(
                F.lit("Answer from context.\nContext:\n"),
                F.concat_ws(
                    "\n\n",
                    F.array_sort(F.collect_list(F.struct("rank", "text"))).text,
                ),
            ).alias("prompt"),
        )
    )
    return assembled.select(
        "n_docs",
        F.length("prompt").cast("long").alias("prompt_chars"),
        generate_text(F.col("prompt")).alias("answer"),
    )


def approx_distinct(
    df: DataFrame, col: str, by: list[str] | None = None
) -> DataFrame:
    """Deterministic-HLL distinct count per group (operators/hll.py).

    The facade for the mergeable-summary layer: same register algebra
    the registry's hll_* queries verify cross-engine, exposed the way
    Spark's own approx_count_distinct is — but reproducible bit-for-bit
    across engines and runs. Returns (by..., v, est).
    """
    from pyspark.sql import functions as F  # local: keep facade thin

    from qa_data_pipeline_rag_llm_spark.operators import hll

    by = list(by or [])
    regs = (
        df.where(F.col(col).isNotNull())
        .select(*by, *hll.register_cols(col))
        .groupBy(*by, "bucket")
        .agg(F.max("r").alias("m_reg"))
    )
    if not by:
        regs = regs.select(F.lit(1).alias("__g"), "bucket", "m_reg")
        return hll.estimate(regs, ["__g"]).drop("__g")
    return hll.estimate(regs, by)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    by: str,
    key_col: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """A-ExpJ weighted reservoir per group (the registry's
    weighted_reservoir_documents as a parameterized facade): top-k rows
    by ln(u)/weight with u a deterministic md5 uniform of ``key_col``.

    ``key_col`` must uniquely identify rows — duplicate keys share u, so
    their selection probabilities would silently correlate (ADVICE r05).
    Passing key_col explicitly asserts uniqueness (no extra scan); when
    it is omitted and the first column is used by convention, that
    column IS validated (one count-distinct pass) so a non-unique
    positional key raises instead of silently distorting the sample.
    That safety pass runs an EAGER Spark job at call time; callers who
    need the pre-r6 single-scan laziness can pass ``validate=False``
    (or, better, an explicit unique ``key_col`` — no extra scan either
    way) and own the uniqueness guarantee themselves (ADVICE r06)."""
    from pyspark.sql import functions as F

    from qa_data_pipeline_rag_llm_spark.operators import hll
    from qa_data_pipeline_rag_llm_spark.operators.ranking import (
        salted_top_k,
    )

    key = key_col or df.columns[0]
    if key not in df.columns:
        raise ValueError(f"key_col {key!r} not in {df.columns}")
    if key_col is None and validate:
        dup = (
            df.groupBy(key).count().where(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(
                f"weighted_sample positional key {key!r} is not unique: "
                "duplicate keys share the deterministic uniform u and "
                "distort selection probabilities — pass a unique row id "
                "as key_col"
            )
    u_num = F.expr(hll.spark_w_sql(key)) + 1
    score = F.log(u_num.cast("double") / F.lit(float(1 << 60))) / F.col(
        weight_col
    )
    return salted_top_k(
        df.where(F.col(weight_col) > 0).withColumn("__res_key", score),
        [by],
        [F.col("__res_key").desc(), F.col(key)],
        k,
        salt_col=key,
        rank_col="rank",
    ).drop("__res_key")


def curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    validate: bool = True,
) -> DataFrame:
    """Curation verdicts for ANY documents-shaped frame — the
    parameterized facade over the registry's oracle-checked
    curation_decisions pipeline: the Gopher hard-rule gate plus the
    MinHash-LSH → connected-component near-dup prune, composed into one
    (rule_keep, dedup_kept, keep, reason) row per doc. The prune keeps
    the minimum id among each cluster's RULE-PASSING members (falling
    back to the cluster's global min when none pass), so a duplicate
    cluster survives whenever ANY copy clears the quality gate.

    ``id_col`` must uniquely identify rows and be totally ordered (the
    survivor choice needs a deterministic order); ``validate=True``
    fail-louds on duplicate ids via the dedup family's contract guard.
    Scale shape: one corpus pass for the rule gate (pure projection),
    the banded near-dup pipeline (never O(n²)), two-star components in
    O(log n) rounds on the pair graph, and 1:1 doc_id joins.
    """
    # anchor on the canonical registry module FIRST: entering the plans
    # package through queries_curation leaves it mid-import when
    # queries_streaming's oracle composition needs its registrations
    # (the bottom-import block must run in queries.py's own order)
    import qa_data_pipeline_rag_llm_spark.plans.queries  # noqa: F401
    from qa_data_pipeline_rag_llm_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from qa_data_pipeline_rag_llm_spark.operators.graph import (
        connected_components_twostar,
    )
    from qa_data_pipeline_rag_llm_spark.plans.queries_curation import (
        gopher_verdict,
    )

    base = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    rules = gopher_verdict(base).select(
        "doc_id", F.col("keep").alias("rule_keep")
    )
    pairs = minhash_lsh_pairs(
        base,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        jaccard_threshold=jaccard_threshold,
        validate=validate,
    )
    labels = connected_components_twostar(pairs, src="doc_a", dst="doc_b")
    clusters = base.select("doc_id").join(
        labels.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    )
    # isolated docs are their own cluster -> trivially kept
    clusters = clusters.select(
        "doc_id",
        F.coalesce("label", F.col("doc_id")).alias("cluster_id"),
    )
    # Dedup survivor = min id among the cluster's RULE-PASSING members
    # (advice r09: keeping the global min unconditionally dropped whole
    # clusters whenever the min-id copy happened to fail the Gopher
    # gate, losing recoverable content a passing duplicate carried).
    # A cluster with no passing member falls back to the global min so
    # dedup_kept stays defined — every copy drops as 'quality' anyway.
    w = Window.partitionBy("cluster_id")
    merged = rules.join(clusters, "doc_id")
    survivor = F.coalesce(
        F.min(F.when(F.col("rule_keep"), F.col("doc_id"))).over(w),
        F.min("doc_id").over(w),
    )
    joined = merged.withColumn("dedup_kept", F.col("doc_id") == survivor)
    reason = (
        F.when(~F.col("rule_keep"), "quality")
        .when(~F.col("dedup_kept"), "near_dup")
        .otherwise("keep")
    )
    return joined.select(
        "doc_id",
        "cluster_id",
        "rule_keep",
        "dedup_kept",
        (F.col("rule_keep") & F.col("dedup_kept")).alias("keep"),
        reason.alias("reason"),
    )
