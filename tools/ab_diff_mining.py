"""A/B the r11 `queries_diff_mining` regression (VERDICT r11 ask #4).

`cross_source_leakage` and `split_leakage_audit_documents` both rebuild
the `minhash_near_dups` pair stream and join it twice against
`documents`; both slowed ~2.2x in r11 when the shingle stage inside that
subtree switched from the `word_shingles_sql` expression to the Arrow
pandas_udf kernel. Hypothesis: the UDF breaks Catalyst subtree/exchange
reuse in the two-consumer shape, doubling the minhash work.

Variants (fresh JVM each — run this script once per variant):
  head     — shipping code
  sqltwin  — `operators.dedup.word_shingles` monkeypatched to the
             expression twin (the pre-r11 plan)
  ckpt     — shipping kernel + localCheckpoint of the pair frame before
             the consumers (the density_cluster_graph fix)

Usage: python tools/ab_diff_mining.py <variant> [runs]
Prints one JSON line: {"variant":..., "queries": {name: [runs...]}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

QUERIES = ("cross_source_leakage", "split_leakage_audit_documents")
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    variant = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    if variant == "sqltwin":
        from qa_data_pipeline_rag_llm_spark.functions import text
        from qa_data_pipeline_rag_llm_spark.operators import dedup

        dedup.word_shingles = text.word_shingles_sql

    from qa_data_pipeline_rag_llm_spark.session import get_spark
    from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY

    if variant == "ckpt":
        spec = REGISTRY["minhash_near_dups"]
        orig = spec.spark

        def ckpt_pairs(spark, sf_dir):
            return orig(spark, sf_dir).localCheckpoint(eager=True)

        spec.spark = ckpt_pairs  # dataclass field; consumers read via REGISTRY

    spark = get_spark(app_name=f"ab_dm_{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: JVM + FS cache, not the queries under test
    from qa_data_pipeline_rag_llm_spark.catalog import load_table

    load_table(spark, SF_DIR, "documents").count()

    out: dict[str, list[float]] = {}
    for q in QUERIES:
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            REGISTRY[q].spark(spark, SF_DIR).collect()
            ts.append(round(time.perf_counter() - t0, 2))
        out[q] = ts
    print(
        json.dumps(
            {
                "variant": variant,
                "queries": out,
                "medians": {
                    q: sorted(v)[len(v) // 2] for q, v in out.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
