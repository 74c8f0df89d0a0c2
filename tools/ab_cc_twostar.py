"""Interleaved A/B: r12 connected-components (min-label + two-star) vs
the r13 rewrite (window-star fusion, one job/round via lazy checkpoint).

Runs both variants on the REAL minhash near-dup pair frame at
$SPARK_GRAFT_SF_DIR (default sf0.1), interleaved A,B,A,B,... in one
session so regime drift hits both arms equally; records per-run wall
seconds, Spark JOB counts (setJobGroup + statusTracker), and verifies
the final labelings are row-identical.

Usage: python tools/ab_cc_twostar.py [--runs=3]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from qa_data_pipeline_rag_llm_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# ----------------------------------------------------------------- r12 twins
def _sym_old(e: DataFrame) -> DataFrame:
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star_old(e_sym: DataFrame) -> DataFrame:
    mins = e_sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        e_sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star_old(e_sym: DataFrame) -> DataFrame:
    lt = e_sym.filter(F.col("v") < F.col("u"))
    mins = lt.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = lt.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    selfs = mins.select("u", F.col("m").alias("v"))
    return nbrs.union(selfs).filter(F.col("u") != F.col("v")).distinct()


def twostar_old(edges, src="src", dst="dst", max_iter=30):
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    verts = (
        e.select(F.col("u").alias("id"))
        .union(e.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def signature(d):
        row = d.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    prev, converged, rounds = None, False, 0
    for _ in range(max_iter):
        e = _small_star_old(_sym_old(_large_star_old(_sym_old(e)))).localCheckpoint(
            eager=True
        )
        rounds += 1
        sig = signature(e)
        if sig == prev:
            converged = True
            break
        prev = sig
    assert converged
    out = verts.join(e, verts.id == e.u, "left").select(
        "id", F.coalesce(F.col("v"), F.col("id")).alias("label")
    )
    return out, rounds


def minlabel_old(edges, src="src", dst="dst", max_iter=30):
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint(eager=True)
    labels = e.select(F.col("a").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.a, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") < F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError("no converge")


# ------------------------------------------------------------------ harness
def timed(spark, tag: str, fn):
    spark.sparkContext.setJobGroup(tag, tag)
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    tracker = spark.sparkContext.statusTracker()
    n_jobs = len(tracker.getJobIdsForGroup(tag))
    spark.sparkContext.setJobGroup(None, None)
    return out, dt, n_jobs


def main() -> None:
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    spark = get_spark(app_name="ab_cc")
    spark.sparkContext.setLogLevel("ERROR")
    # anchor the registry module first (same circular-import note as
    # api.curate): queries_text must not be the package entry point
    import qa_data_pipeline_rag_llm_spark.plans.queries  # noqa: F401
    from qa_data_pipeline_rag_llm_spark.catalog import load_table
    from qa_data_pipeline_rag_llm_spark.operators.dedup import minhash_lsh_pairs
    from qa_data_pipeline_rag_llm_spark.operators.graph import (
        connected_components,
        connected_components_twostar,
    )
    from qa_data_pipeline_rag_llm_spark.plans.queries_text import (
        BANDS,
        JACCARD_T,
        NUM_PERM,
        SHINGLE_N,
    )

    docs = load_table(spark, SF_DIR, "documents")
    pairs = (
        minhash_lsh_pairs(
            docs,
            num_perm=NUM_PERM,
            bands=BANDS,
            shingle_n=SHINGLE_N,
            jaccard_threshold=JACCARD_T,
        )
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)  # isolate CC cost from pair generation
    )
    print(f"pairs: {pairs.count()}", flush=True)

    # output parity once per algorithm family
    new_ts = connected_components_twostar(pairs, "doc_a", "doc_b")
    old_ts, rounds = twostar_old(pairs, "doc_a", "doc_b")
    diff = new_ts.exceptAll(old_ts).count() + old_ts.exceptAll(new_ts).count()
    print(f"twostar parity: diff_rows={diff} rounds={rounds}", flush=True)
    assert diff == 0
    new_ml = connected_components(pairs, "doc_a", "doc_b")
    old_ml = minlabel_old(pairs, "doc_a", "doc_b")
    diff = new_ml.exceptAll(old_ml).count() + old_ml.exceptAll(new_ml).count()
    print(f"minlabel parity: diff_rows={diff}", flush=True)
    assert diff == 0

    for title, old_fn, new_fn in (
        (
            "twostar",
            lambda: twostar_old(pairs, "doc_a", "doc_b")[0],
            lambda: connected_components_twostar(pairs, "doc_a", "doc_b"),
        ),
        (
            "minlabel",
            lambda: minlabel_old(pairs, "doc_a", "doc_b"),
            lambda: connected_components(pairs, "doc_a", "doc_b"),
        ),
    ):
        for i in range(runs):
            for tag, fn in (("old", old_fn), ("new", new_fn)):
                _, dt, n_jobs = timed(
                    spark,
                    f"{title}-{tag}-{i}",
                    lambda fn=fn: fn().write.format("noop")
                    .mode("overwrite")
                    .save(),
                )
                print(
                    f"{title} {tag} run{i}: {dt:.3f}s jobs={n_jobs}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
