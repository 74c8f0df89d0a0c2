"""Registry entries: corpus CONTRIBUTION analysis and span-level CLEANING.

The curation family (queries_curation.py) measures duplication burden and
decides keep/drop at document granularity. This module closes the two gaps
a production training-data pipeline still has after that:

  * ``remove_dup_spans_documents`` — the TRANSFORM the span-dup measurement
    implies: excise every cross-document duplicated word 8-gram span and
    emit the cleaned text (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better" — their ExactSubstr dedup, re-expressed
    relationally at word granularity instead of a suffix array, which does
    not distribute). The reference's only cleaning is whole-row drops +
    regex (``/root/reference/REDDIT-Nettoyage-Posts.py:37-53``); span
    excision is the corpus-scale extension.
  * ``ngram_novelty_by_source`` — marginal-contribution ranking: which
    sources still add unseen n-grams (treating ``doc_id`` as ingestion
    order)? The classic "is this crawl worth ingesting" curation signal.
  * ``token_entropy_by_source`` — unigram Shannon entropy per source:
    lexical-diversity quality signal (low entropy ⇒ boilerplate/templated
    text), computed with the scaled-integer-term trick so the double sum
    is order-independent and hash-stable cross-engine.
  * ``hard_negatives_embeddings`` — contrastive-training data mining: for
    each probe vector, the top-k most cosine-similar vectors with a
    DIFFERENT label (the "hard negative" shape retrieval encoders train
    on). Probe side bounded and broadcast, like ``cosine_topk``.

Scale notes (100 TB): span removal is 4 narrow shuffles — gram-hash df,
dup-gram join-back, covered-position distinct, final per-doc regroup — all
keyed on 32-bit hashes or (doc_id, pos); no pair materialization, no
single-partition window. Novelty is two hash-keyed aggregations. Entropy
aggregates to the (source, token) frame first — map-side combine absorbs
the corpus. Hard negatives broadcast the bounded probe set against a full
scan; only the per-probe top-k ranks shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.hashing import stable_int32
from qa_data_pipeline_rag_llm_spark.functions.text import (
    token_count,
    tokens,
    word_shingles,
)
from qa_data_pipeline_rag_llm_spark.functions.vectors import dot, norm, safe_denom
from qa_data_pipeline_rag_llm_spark.plans import oracle_fragments as O
from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register
from qa_data_pipeline_rag_llm_spark.plans.queries_vector import _O_COS

SPAN_N = 8        # word n-gram width — same frame as span_dup_fraction
HN_PROBES = 25    # hard-negative probe set: vec_id < 25 (deterministic)
HN_K = 5
BPE_TOP = 30      # merge candidates surfaced per BPE training round
MIX_ALPHA = 0.3   # temperature exponent (mT5/XLM-R-style p ∝ n^alpha)


@register(
    "remove_dup_spans_documents",
    f"""
    WITH w AS (SELECT doc_id, {O.toks("text")} AS ws FROM documents),
    tok AS (SELECT doc_id, unnest(ws) AS word,
                   generate_subscripts(ws, 1) AS p
            FROM w),
    g0 AS (SELECT doc_id, ws,
                  unnest(CASE WHEN len(ws) >= {SPAN_N}
                              THEN range(1, len(ws) - {SPAN_N} + 2)
                              ELSE [] END) AS i
           FROM w),
    gh AS (SELECT doc_id, i,
                  {O.stable_int32(f"array_to_string(ws[i:i+{SPAN_N - 1}], ' ')")} AS gh
           FROM g0),
    dup AS (SELECT gh FROM gh GROUP BY gh
            HAVING COUNT(DISTINCT doc_id) >= 2),
    cov AS (SELECT DISTINCT doc_id, unnest(range(i, i + {SPAN_N})) AS p
            FROM gh JOIN dup USING (gh)),
    per_doc AS (
      SELECT t.doc_id,
             COUNT(*) AS n_words,
             SUM(CASE WHEN c.p IS NOT NULL THEN 1 ELSE 0 END) AS n_removed,
             coalesce(string_agg(CASE WHEN c.p IS NULL THEN t.word END,
                                 ' ' ORDER BY t.p), '') AS clean_text
      FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.p
      GROUP BY t.doc_id)
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_removed AS BIGINT) AS n_removed,
           round(n_removed * 1.0 / n_words, 6) AS removed_frac,
           clean_text
    FROM per_doc
    """,
    doc="Exact duplicated-span REMOVAL (Lee et al. 2022 ExactSubstr, word-"
    "granular): every word position covered by any cross-document "
    "duplicated 8-gram is excised; emits the stitched clean text plus "
    "removal accounting. The transform twin of span_dup_fraction_documents "
    "(which only measures). Distributed (r12 single-pass shape): dup "
    "grams by exact document frequency over 32-bit hashes, covered "
    "positions aggregated per doc into ONE array<int> from the "
    "duplicated start offsets, then every output column — including the "
    "order-preserving clean-text stitch (array_except keeps ascending "
    "positions) — is a map-side array expression over the doc's token "
    "array. The only data-sized shuffles carry gram hashes and start "
    "offsets, never the token stream. No suffix array, no pairs, no "
    "single-partition window.",
)
def remove_dup_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.operators.util import (
        ensure_parallelism,
    )

    # r12: the clean-text stitch is now a map-side array projection (see
    # below), and the broadcast join keeps it in the SCAN stage — which
    # plans as ONE task on a single-file parquet input. Spread the scan
    # first so the per-doc array work uses every core.
    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    w = d.select("doc_id", tokens("text").alias("ws"))
    starts = (
        w.filter(F.size("ws") >= SPAN_N)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ws) - {SPAN_N - 1}), "
                    f"i -> struct(i, concat_ws(' ', slice(ws, i, {SPAN_N})) AS gram))"
                )
            ).alias("s"),
        )
        .select(
            "doc_id",
            F.col("s.i").alias("i"),
            stable_int32(F.col("s.gram")).alias("gh"),
        )
    )
    dup = (
        starts.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("gh")
    )
    # r12 single-pass restructure (guide §2.3 "shuffle fewer bytes"): the
    # old plan exploded EVERY token to (doc_id, p, word) rows, shuffled
    # that stream through a (doc_id, p) join against the exploded-distinct
    # covered positions, and re-grouped per doc with a sorted collect_list
    # — three corpus-sized exchanges to re-derive per-row facts. Covered
    # positions are a per-doc set derivable from the duplicated START
    # offsets alone, so: aggregate starts → one array<int> per doc (the
    # only remaining data-sized shuffle carries start offsets, not
    # tokens), then every output column is a map-side array expression
    # over the doc's token array (array_except keeps ascending order, so
    # clean_text word order is identical). 4.74 → ~1.5 s at sf0.1; output
    # bit-identical (driver-emulation hash vs the unchanged oracle).
    rem_arr = (
        starts.join(dup, "gh")
        .groupBy("doc_id")
        .agg(
            F.array_distinct(
                F.flatten(
                    F.collect_list(
                        F.expr(f"sequence(i, i + {SPAN_N - 1})")
                    )
                )
            ).alias("rem")
        )
    )
    kept = F.array_except(
        F.sequence(F.lit(1), F.size("ws")),
        F.coalesce(F.col("rem"), F.expr("CAST(array() AS array<int>)")),
    )
    per_doc = (
        w.filter(F.size("ws") > 0)
        .join(rem_arr, "doc_id", "left")
        .select(
            "doc_id",
            F.size("ws").cast("long").alias("n_words"),
            # size over the null-coalesced array, not coalesce over
            # size(NULL): under Spark 3.x non-ANSI defaults size(NULL)
            # is -1, which would silently make clean docs read
            # n_removed=-1 (ADVICE r12). Same value on Spark 4.
            F.size(
                F.coalesce(
                    F.col("rem"), F.expr("CAST(array() AS array<int>)")
                )
            )
            .cast("long")
            .alias("n_removed"),
            F.array_join(
                F.transform(kept, lambda i: F.element_at(F.col("ws"), i)),
                " ",
            ).alias("clean_text"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        "n_removed",
        F.round(F.col("n_removed") * 1.0 / F.col("n_words"), 6).alias(
            "removed_frac"
        ),
        "clean_text",
    )


@register(
    "ngram_novelty_by_source",
    f"""
    WITH occ AS (
      SELECT DISTINCT doc_id, source, {O.stable_int32("g")} AS gh
      FROM (SELECT doc_id, source,
                   unnest({O.shingles("text", SPAN_N)}) AS g
            FROM documents)),
    first AS (SELECT gh, MIN(doc_id) AS first_doc FROM occ GROUP BY gh)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_gram_occ,
           CAST(SUM(CASE WHEN o.doc_id = f.first_doc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(SUM(CASE WHEN o.doc_id = f.first_doc THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS novelty_rate
    FROM occ o JOIN first f USING (gh)
    GROUP BY source
    """,
    doc="Marginal-contribution ranking: per source, the fraction of its "
    "distinct (doc, 8-gram) occurrences whose gram first appears in that "
    "very document (doc_id as ingestion order) — i.e. how much genuinely "
    "new text each source still contributes vs re-crawl of what the "
    "corpus already holds. The is-this-source-worth-ingesting curation "
    "signal (complements near_dup_rate_by_source, which measures whole-"
    "doc redundancy). Two hash-keyed aggregations, narrow rows — linear "
    "at corpus scale.",
)
def ngram_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    occ = (
        d.select(
            "doc_id",
            "source",
            F.explode(word_shingles("text", SPAN_N)).alias("gram"),
        )
        .select("doc_id", "source", stable_int32("gram").alias("gh"))
        .distinct()
    )
    first = occ.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
    return (
        occ.join(first, "gh")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_gram_occ"),
            F.sum(novel).alias("n_novel"),
            F.round(F.sum(novel) * 1.0 / F.count("*"), 6).alias(
                "novelty_rate"
            ),
        )
    )


@register(
    "token_entropy_by_source",
    f"""
    WITH tok AS (SELECT source, unnest({O.toks("text")}) AS w
                 FROM documents),
    tc AS (SELECT source, w, COUNT(*) AS c FROM tok
           WHERE w != '' GROUP BY source, w),
    tot AS (SELECT source, SUM(c) AS n FROM tc GROUP BY source)
    SELECT t.source,
           CAST(tot.n AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           round(CAST(SUM(CAST(CAST(round(-(c * 1.0 / tot.n)
                     * (ln(c * 1.0 / tot.n) / ln(2.0))
                     * 1000000000) AS BIGINT)
                 AS DECIMAL(38,0))) AS DOUBLE) / 1000000000.0, 6)
             AS entropy_bits
    FROM tc t JOIN tot USING (source)
    GROUP BY t.source, tot.n
    """,
    doc="Unigram Shannon entropy per source — the lexical-diversity "
    "quality signal (low entropy ⇒ templated/boilerplate text; Gopher "
    "uses the same family of repetition signals document-level). Each "
    "-p·log2(p) term is rounded to a scaled integer (1e-9 resolution) "
    "before summing, so the floating sum is order-independent and the "
    "cross-engine hash comparison is exact — the o_exact_sum discipline "
    "applied to an irrational-valued aggregate. Aggregates to the "
    "(source, token) frame first: map-side combine absorbs the corpus.",
)
def token_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(tokens("text")).alias("w")
    ).filter(F.col("w") != "")
    tc = tok.groupBy("source", "w").agg(F.count("*").alias("c"))
    tot = tc.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    # ln(p)/ln(2), not log2(p): both engines' ln is validated bit-stable
    # on this data; their log2 need not share libm rounding (the _gain
    # discipline, queries_evals — advice r03)
    term9 = F.round(
        -p * (F.log(p) / F.log(F.lit(2.0))) * 1_000_000_000
    ).cast("long")
    return (
        tc.join(tot, "source")
        .select("source", "n", term9.alias("t9"))
        .groupBy("source", "n")
        .agg(
            F.count("*").alias("n_types"),
            F.round(
                F.sum("t9").cast("double") / 1_000_000_000.0, 6
            ).alias("entropy_bits"),
        )
        .select(
            "source",
            F.col("n").alias("n_tokens"),
            "n_types",
            "entropy_bits",
        )
    )


@register(
    "hard_negatives_embeddings",
    f"""
    WITH scored AS (
      SELECT p.vec_id AS probe_id, p.label AS probe_label,
             e.vec_id, e.label AS neg_label, {_O_COS} AS sim
      FROM embeddings e
      JOIN embeddings p ON p.vec_id < {HN_PROBES} AND e.label != p.label)
    SELECT probe_id, probe_label, vec_id, neg_label, sim,
           CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                       ORDER BY sim DESC, vec_id) AS rank
          FROM scored)
    WHERE rank <= {HN_K}
    """,
    doc="Hard-negative mining for contrastive training: per probe vector, "
    "the top-5 most cosine-similar vectors whose label DIFFERS — the "
    "near-miss negatives a retrieval encoder trains against (the data-"
    "prep step upstream of the reference's embedding model, "
    "PLATFORM-contextual-Chunking.py:52-77). Bounded probe set broadcast "
    "against a full scan (label-mismatch is the join predicate — "
    "BroadcastNestedLoopJoin with a tiny build side); only the per-probe "
    "top-k rank shuffles, partitioned by probe.",
)
def hard_negatives_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    v = e.withColumn("_vn", norm("embedding"))
    p = (
        e.filter(F.col("vec_id") < HN_PROBES)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("label").alias("probe_label"),
            F.col("embedding").alias("probe_vec"),
        )
        .withColumn("_pn", norm("probe_vec"))
    )
    scored = v.join(
        F.broadcast(p), F.col("label") != F.col("probe_label")
    ).select(
        "probe_id",
        "probe_label",
        "vec_id",
        F.col("label").alias("neg_label"),
        F.round(
            dot("embedding", "probe_vec")
            / safe_denom(F.col("_vn") * F.col("_pn")),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HN_K)
        .select("probe_id", "probe_label", "vec_id", "neg_label", "sim", "rank")
    )


@register(
    "bpe_merge_pairs_documents",
    f"""
    WITH tok AS (SELECT unnest({{toks}}) AS w FROM documents),
    vocab AS (SELECT w, COUNT(*) AS c FROM tok WHERE w != '' GROUP BY w),
    pairs AS (
      SELECT substr(w, i, 2) AS pair, c
      FROM (SELECT w, c, unnest(range(1, len(w))) AS i
            FROM vocab WHERE len(w) >= 2)),
    agg AS (SELECT pair, CAST(SUM(c) AS BIGINT) AS freq
            FROM pairs GROUP BY pair)
    SELECT pair, freq, CAST(rank AS INTEGER) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY freq DESC, pair) AS rank
      FROM agg)
    WHERE rank <= {{BPE_TOP}}
    """.format(toks=O.toks("text"), BPE_TOP=BPE_TOP),
    doc="BPE trainer inner step (Sennrich et al. 2016): adjacent character-"
    "pair frequencies weighted by word count — the exact statistic a "
    "merge round maximizes. Completes the tokenizer-planning family "
    "(budget/coverage/OOV/fertility report on an EXISTING vocab; this is "
    "the statistic that BUILDS one). Corpus-scale trick: aggregate to "
    "the distinct-word vocab frame FIRST, so the pair explode runs over "
    "the vocabulary (bounded, Heaps-law-sublinear) instead of the corpus "
    "token stream; the pair-agg frame is alphabet-squared-bounded and "
    "top-30 goes through orderBy+limit (TakeOrderedAndProject) before "
    "the display rank.",
)
def bpe_merge_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens("text")).alias("w")).filter(
        F.col("w") != ""
    )
    vocab = tok.groupBy("w").agg(F.count("*").alias("c"))
    pairs = vocab.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "c",
    )
    agg = pairs.groupBy("pair").agg(F.sum("c").alias("freq"))
    top = agg.orderBy(F.desc("freq"), "pair").limit(BPE_TOP)
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("freq"), "pair")),
    )


@register(
    "source_temperature_weights",
    f"""
    WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM({{tc}}) AS BIGINT) AS n_tokens
               FROM documents GROUP BY source),
    p AS (SELECT *, CAST(round(CASE WHEN n_tokens > 0
                      THEN exp({{A}} * ln(n_tokens)) ELSE 0.0 END
                      * 1000000000) AS BIGINT) AS pw9
          FROM s),
    tot AS (SELECT SUM(pw9) AS z FROM p)
    SELECT source, n_docs, n_tokens,
           round(pw9 * 1.0 / z, 6) AS sample_weight
    FROM p, tot
    """.format(tc=O.token_count("text"), A=MIX_ALPHA),
    doc="Temperature-scaled source sampling weights: p(source) ∝ "
    "n_tokens^0.3 (the mT5/XLM-R multilingual recipe — upweights small "
    "sources without letting the head dominate). Each power term is "
    "rounded to a scaled integer before the normalizing sum, so the "
    "denominator is order-independent and the weights hash-stable "
    "cross-engine. One groupBy to the per-source frame, then a "
    "broadcast of the one-row total — nothing here grows with the "
    "corpus beyond the first aggregation.",
)
def source_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).alias("n_tokens"),
    )
    # exp(A·ln n), not pow(n, A): fractional-exponent pow is a libm
    # call whose rounding the two engines need not share; exp and ln
    # are the validated-bit-stable primitives (advice r03)
    p = s.withColumn(
        "pw9",
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.exp(F.lit(MIX_ALPHA) * F.log("n_tokens")),
            ).otherwise(F.lit(0.0))
            * 1_000_000_000
        ).cast("long"),
    )
    tot = p.agg(F.sum("pw9").alias("z"))
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            # ANSI-safe: z = 0 only on an all-empty corpus — match the
            # oracle's divide-by-zero NULL instead of throwing
            F.round(
                F.col("pw9") * 1.0 / F.when(F.col("z") != 0, F.col("z")),
                6,
            ).alias("sample_weight"),
        )
    )


# Repeat-epochs ceiling for the mixing plan: past ~4 epochs repeated
# pretraining data decays in value (the data-constrained-scaling
# observation), so a source the temperature weights would sample past
# the cap is flagged and its target capped.
EPOCH_CAP = 4


@register(
    "mixture_epochs_plan",
    f"""
    WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM({{tc}}) AS BIGINT) AS n_tokens
               FROM documents GROUP BY source),
    p AS (SELECT *, CAST(round(CASE WHEN n_tokens > 0
                      THEN exp({{A}} * ln(n_tokens)) ELSE 0.0 END
                      * 1000000000) AS BIGINT) AS pw9
          FROM s),
    tot AS (SELECT CAST(SUM(pw9) AS DECIMAL(19,0)) AS z,
                   CAST(SUM(CAST(n_tokens AS DECIMAL(19,0)))
                        AS DECIMAL(19,0)) AS big_n
            FROM p)
    SELECT source, n_tokens,
           round(pw9 * 1.0 / z, 6) AS sample_weight,
           CAST(round(CAST(CAST(pw9 AS DECIMAL(19,0)) * big_n
                           AS DOUBLE)
                      / CAST(z AS DOUBLE)) AS BIGINT) AS target_tokens,
           CASE WHEN n_tokens > 0
                THEN round(CAST(CAST(pw9 AS DECIMAL(19,0)) * big_n
                                AS DOUBLE)
                           / (CAST(z AS DOUBLE) * n_tokens), 6)
           END AS epochs,
           CAST(pw9 AS DECIMAL(19,0)) * big_n
             > {EPOCH_CAP} * z * CAST(n_tokens AS DECIMAL(19,0))
             AS over_cap,
           least(CAST(round(CAST(CAST(pw9 AS DECIMAL(19,0)) * big_n
                                 AS DOUBLE)
                            / CAST(z AS DOUBLE)) AS BIGINT),
                 {EPOCH_CAP} * n_tokens) AS capped_target_tokens
    FROM p, tot
    """.format(tc=O.token_count("text"), A=MIX_ALPHA),
    doc=f"Training-mixture epoch plan at a corpus-sized token budget "
    "(B = total corpus tokens): each source's temperature-weighted "
    "target (w_s·B), the EPOCHS that target implies (target / "
    f"available — the over-sampling factor), an over-cap flag past "
    f"{EPOCH_CAP} epochs decided by exact decimal cross-multiplication "
    "(repeated pretraining data decays in value past a few epochs — "
    "the data-constrained-scaling caveat the raw temperature recipe "
    "ignores), and the capped target. Same per-source frame and "
    "scaled-integer power terms as source_temperature_weights; "
    "model-sized after one groupBy.",
)
def mixture_epochs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).alias("n_tokens"),
    )
    p = s.withColumn(
        "pw9",
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.exp(F.lit(MIX_ALPHA) * F.log("n_tokens")),
            ).otherwise(F.lit(0.0))
            * 1_000_000_000
        ).cast("long"),
    )
    d19 = "decimal(19,0)"
    tot = p.agg(
        F.sum("pw9").cast(d19).alias("z"),
        F.sum(F.col("n_tokens").cast(d19)).cast(d19).alias("big_n"),
    )
    pw_d = F.col("pw9").cast(d19)
    target_d = (pw_d * F.col("big_n")).cast("double") / F.col("z").cast(
        "double"
    )
    target = F.round(target_d).cast("long")
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.round(F.col("pw9") * 1.0 / F.col("z"), 6).alias(
                "sample_weight"
            ),
            target.alias("target_tokens"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    (pw_d * F.col("big_n")).cast("double")
                    / (F.col("z").cast("double") * F.col("n_tokens")),
                    6,
                ),
            ).alias("epochs"),
            (
                pw_d * F.col("big_n")
                > EPOCH_CAP * F.col("z") * F.col("n_tokens").cast(d19)
            ).alias("over_cap"),
            F.least(target, EPOCH_CAP * F.col("n_tokens")).alias(
                "capped_target_tokens"
            ),
        )
    )


BATCH = 32  # sequences per inference/training micro-batch


@register(
    "padding_waste_by_batching",
    f"""
    WITH lens AS (SELECT doc_id, coalesce({{tc}}, 0) AS len FROM documents),
    a AS (SELECT len, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn FROM lens),
    ab AS (SELECT (rn - 1) // {{B}} AS b, COUNT(*) AS c,
                  MAX(len) AS m, SUM(len) AS s
           FROM a GROUP BY 1),
    s0 AS (SELECT len, doc_id,
                  ROW_NUMBER() OVER (ORDER BY len, doc_id) AS rn FROM lens),
    sb AS (SELECT (rn - 1) // {{B}} AS b, COUNT(*) AS c,
                  MAX(len) AS m, SUM(len) AS s
           FROM s0 GROUP BY 1),
    u AS (
      SELECT 'arrival' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_batches,
             CAST(SUM(s) AS BIGINT) AS total_tokens,
             CAST(SUM(c * m - s) AS BIGINT) AS padding_tokens
      FROM ab
      UNION ALL
      SELECT 'length_sorted', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(s) AS BIGINT), CAST(SUM(c * m - s) AS BIGINT)
      FROM sb)
    SELECT strategy, n_batches, total_tokens, padding_tokens,
           round(padding_tokens * 1.0
                 / (padding_tokens + total_tokens), 6) AS waste_frac
    FROM u
    """.format(tc=O.token_count("text"), B=BATCH),
    doc="Inference/training batch planning: padding waste (Σ per-batch "
    "count·max_len − Σ len) of arrival-order batches vs length-sorted "
    "batches of 32 — the measurement behind bucketed batching / "
    "sorted-sequence packing in serving systems. Both global ranks run "
    "through the two-pass partition-offset pattern "
    "(operators/cumulative.rank_cumsum: data-derived range buckets, no "
    "single-task window); per-batch aggregation is an ordinary "
    "hash-keyed groupBy on the batch id.",
)
def padding_waste_by_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qa_data_pipeline_rag_llm_spark.operators.cumulative import (
        rank_cumsum,
    )

    d = _t(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id", F.coalesce(token_count("text"), F.lit(0)).alias("len")
    )

    def batched(df: DataFrame, order, bucket: str) -> DataFrame:
        ranked = rank_cumsum(df, order, "len", bucket_col=bucket)
        return (
            ranked.withColumn(
                "b", F.floor((F.col("rank") - 1) / BATCH)
            )
            .groupBy("b")
            .agg(
                F.count("*").alias("c"),
                F.max("len").alias("m"),
                F.sum("len").alias("s"),
            )
            .agg(
                F.count("*").alias("n_batches"),
                F.sum("s").alias("total_tokens"),
                F.sum(F.col("c") * F.col("m") - F.col("s")).alias(
                    "padding_tokens"
                ),
            )
        )

    arrival = batched(lens, [F.col("doc_id")], "doc_id").select(
        F.lit("arrival").alias("strategy"), "*"
    )
    by_len = batched(lens, [F.col("len"), F.col("doc_id")], "len").select(
        F.lit("length_sorted").alias("strategy"), "*"
    )
    u = arrival.unionByName(by_len)
    return u.select(
        "strategy",
        "n_batches",
        "total_tokens",
        "padding_tokens",
        F.round(
            F.col("padding_tokens")
            * 1.0
            / (F.col("padding_tokens") + F.col("total_tokens")),
            6,
        ).alias("waste_frac"),
    )
