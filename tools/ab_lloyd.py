"""A/B: the shipping pos-join Lloyd trainer (operators/ivf.py
train_centroids_lloyd) vs the zero-corpus-shuffle one-expr argmin
variant r12 rejected at sf0.1 — re-adjudicated at sf>=1 per VERDICT r12
ask #4 ("probe where shuffle bytes dominate; ship whichever wins THERE").

The one-expr variant per round:
  * collects the k x dims centroid table to the driver (bounded: k
    cells, same bound seed_centroids already lives on),
  * assignment is ONE parsed SQL expression: exact-integer squared-L2
    argmin over literal centroid arrays (ties -> smaller cluster id,
    identical to the struct-min), evaluated as a zero-shuffle projection
    over the raw vectors — the corpus-sized groupBy(vid, cluster) +
    groupBy(vid) shuffles of the pos-join trainer are GONE,
  * the update is posexplode + groupBy(cluster, pos) with map-side
    combine (output bounded at k x dims per task) — the only exchange.

Identity: both variants compute the same v6 integer translation, the
same argmin tie-break, the same floor-average update, so the returned
centroid lists must be EXACTLY equal (asserted).

Usage: python tools/ab_lloyd.py [--runs=3] [--sf-dir=/tmp/sfsynth1]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from qa_data_pipeline_rag_llm_spark.session import get_spark  # noqa: E402


def train_centroids_lloyd_expr(
    vectors: DataFrame,
    n_cells: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """One-expr argmin Lloyd's — contract-identical to
    ivf.train_centroids_lloyd (same v6 translation, tie-break, floor
    average), different distribution shape (see module docstring)."""
    v6 = vectors.select(
        F.col(id_col).alias("vid"),
        F.expr(
            f"transform(`{vec_col}`, x -> CAST(round((CAST(x AS DOUBLE)"
            " + 1.0) * 1000000) AS BIGINT))"
        ).alias("v6"),
    ).localCheckpoint(eager=True)  # the translation is shared by every round

    seeds = (
        v6.select("vid", "v6").orderBy("vid").limit(n_cells).collect()
    )
    cents: list[tuple[int, list[int]]] = sorted(
        (int(r["vid"]), list(r["v6"])) for r in seeds
    )

    def argmin_sql(cs: list[tuple[int, list[int]]]) -> str:
        # exact integer squared-L2 per centroid; struct-min (dist, cid)
        # == min dist then min cluster id — the same lexicographic
        # tie-break as the pos-join trainer's F.min(struct(dist,cluster))
        terms = []
        for cid, c6 in cs:
            arr = "array(" + ", ".join(str(int(x)) + "L" for x in c6) + ")"
            d = (
                f"aggregate(zip_with(v6, {arr}, (x, y) -> (x - y) * (x - y)),"
                " 0L, (acc, v) -> acc + v)"
            )
            terms.append(f"named_struct('dist', {d}, 'cluster', {int(cid)})")
        return f"least({', '.join(terms)}).cluster" if len(terms) > 1 else (
            f"{terms[0]}.cluster"
        )

    for _ in range(iters):
        assigned = v6.select(
            F.expr(argmin_sql(cents)).alias("cluster"), "v6"
        )
        rows = (
            assigned.select(
                "cluster", F.posexplode("v6").alias("pos0", "val")
            )
            .groupBy("cluster", F.col("pos0"))
            .agg(F.expr("sum(val) div count(*)").cast("long").alias("c6"))
            .collect()
        )
        by_c: dict[int, dict[int, int]] = {}
        for r in rows:
            by_c.setdefault(int(r["cluster"]), {})[int(r["pos0"])] = int(
                r["c6"]
            )
        cents = sorted(
            (cid, [d[p] for p in sorted(d)]) for cid, d in by_c.items()
        )
    v6.unpersist()
    return sorted(
        (cid, [x / 1_000_000.0 - 1.0 for x in c6]) for cid, c6 in cents
    )


def main() -> None:
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
    spark = get_spark(app_name="ab_lloyd")
    spark.sparkContext.setLogLevel("ERROR")
    from qa_data_pipeline_rag_llm_spark.catalog import load_table
    from qa_data_pipeline_rag_llm_spark.operators.ivf import (
        train_centroids_lloyd,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    print(f"{sf_dir}: {emb.count()} vectors", flush=True)

    a = train_centroids_lloyd(emb, 16)
    b = train_centroids_lloyd_expr(emb, 16)
    print(f"parity: {'EQUAL' if a == b else 'DIFFER'}", flush=True)
    assert a == b

    for i in range(runs):
        for tag, fn in (
            ("posjoin", train_centroids_lloyd),
            ("oneexpr", train_centroids_lloyd_expr),
        ):
            t0 = time.perf_counter()
            fn(emb, 16)
            print(
                f"{tag} run{i}: {time.perf_counter() - t0:.3f}s", flush=True
            )


if __name__ == "__main__":
    main()
