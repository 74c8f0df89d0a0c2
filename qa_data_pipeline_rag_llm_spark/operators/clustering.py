"""Clustering-adjacent operators: similar-items self-join (J3/M3) + KMeans (M2).

The reference computes, per post, the other posts of its HDBSCAN cluster
(cap 20; noise cluster −1 → empty) with a driver-side dict
(``/root/reference/PLATFORM-contextual-Chunking.py:97-113``). Here it is a
groupBy + rejoin on the cluster key — one shuffle, no driver state.

Distributed HDBSCAN does not exist in Spark ML (SURVEY.md §4 'custom-rule
assessment'); :func:`kmeans_assign` is the documented-divergence stand-in
behind the same column contract (label, −1 never produced by KMeans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
