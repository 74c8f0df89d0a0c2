"""Clustering-adjacent operators: similar-items self-join (J3/M3) + M2 paths.

The reference computes, per post, the other posts of its HDBSCAN cluster
(cap 20; noise cluster −1 → empty) with a driver-side dict
(``/root/reference/PLATFORM-contextual-Chunking.py:97-113``). Here it is a
groupBy + rejoin on the cluster key — one shuffle, no driver state.

Distributed HDBSCAN does not exist in Spark ML (SURVEY.md §4 'custom-rule
assessment'), so M2 ships two stand-ins behind the same column contract:

  * :func:`kmeans_assign` — Spark ML KMeans (documented divergence: fixed
    k, never emits −1, RNG-seeded → rows-only checkable);
  * :func:`density_cluster` — deterministic DBSCAN-style density
    clustering over SRP-LSH buckets that DOES reproduce the reference's
    noise semantics (sparse region → label −1) and is fully
    oracle-checkable: dense signature-buckets (≥ min_pts members) become
    clusters labeled by their minimum member id; everything else is noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.operators.similarity import srp_signatures


def similar_items(
    df: DataFrame,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    cap: int = 20,
    noise_label: int = -1,
    out_col: str = "similar_ids",
) -> DataFrame:
    """Per row: ids of the other members of its cluster, sorted, first
    ``cap``; noise rows get an empty array."""
    members = df.groupBy(cluster_col).agg(
        F.sort_array(F.collect_list(id_col)).alias("__members")
    )
    return (
        df.join(members, cluster_col)
        .select(
            id_col,
            F.col(cluster_col),
            F.when(F.col(cluster_col) == noise_label, F.array().cast("array<string>"))
            .otherwise(
                F.slice(
                    F.array_remove(
                        F.col("__members").cast("array<string>"),
                        F.col(id_col).cast("string"),
                    ),
                    1,
                    cap,
                )
            )
            .alias(out_col),
        )
    )


def density_cluster(
    df: DataFrame,
    planes: int = 8,
    min_pts: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Deterministic density clustering with HDBSCAN-parity NOISE labels
    (M2; reference: ``PLATFORM-contextual-Chunking.py:83-94``,
    min_cluster_size=5, label −1 = noise).

    Fixed-epsilon density via LSH geometry: an SRP signature over
    ``planes`` hyperplanes partitions the sphere into 2^planes angular
    cells; vectors sharing a cell are mutual neighbors within the cell's
    angular epsilon. A cell with ≥ ``min_pts`` members is a dense region
    → cluster, labeled by its minimum member id (deterministic, no RNG);
    sparser cells are noise → label −1. Unlike KMeans this needs no k,
    produces −1, and every step (projection folds, count, min) is
    oracle-replayable SQL.

    Scale: signatures are a zero-shuffle projection; the bucket
    aggregation is one map-side-combinable groupBy on ≤ 2^planes keys;
    the label join broadcasts the tiny bucket table. Returns (id, label).
    """
    sig = srp_signatures(df, planes, id_col, vec_col, dims=dims)
    buckets = sig.groupBy("sig").agg(
        F.count("*").alias("__n"), F.min(id_col).alias("__cid")
    )
    return sig.join(F.broadcast(buckets), "sig").select(
        id_col,
        F.when(F.col("__n") >= min_pts, F.col("__cid"))
        .otherwise(F.lit(-1))
        .cast("int")
        .alias("label"),
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Assign KMeans cluster labels to an ``array<float>`` column (M2
    stand-in; semantics diverge from the reference's HDBSCAN — no noise
    label, fixed k). Returns (id, cluster)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(
        F.col(id_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(feat)
    return model.transform(feat).select(
        F.col(id_col), F.col("prediction").alias("cluster")
    )
