"""Connected components: near-dup PAIRS → duplicate CLUSTERS.

LSH emits pairwise matches; real corpus dedup must group them
transitively (A~B, B~C ⇒ {A,B,C} keep one). That is connected
components — union-find does not distribute, so this is iterative
min-label propagation: every vertex repeatedly adopts the smallest label
in its neighborhood until fixpoint, converging in O(graph diameter)
rounds. Near-dup graphs are unions of small dense blobs, so the
diameter — and the round count — is tiny regardless of corpus size.

Scale notes: the symmetrized edge list is checkpointed once and reused
every round; labels are re-checkpointed per round so lineage stays O(1)
instead of growing by one join per iteration (the classic iterative-
Spark failure mode). The per-round convergence check is a scalar
``count()`` — an action, not a data collect. For planet-scale graphs
swap the loop body for the large-star/small-star variant (Kiveris et
al., "Connected Components in MapReduce and Beyond") — same contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """(src, dst) undirected edges → (id, label) with label = min vertex
    id reachable. Only vertices present in edges appear; callers join
    isolated vertices back with label = own id."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint(eager=True)  # scanned every round — cut lineage once
    labels = (
        e.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
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
                F.least(
                    F.col("label"), F.coalesce("nbr_min", F.col("label"))
                ).alias("label"),
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
            break
    return labels
