"""Dump `.explain("formatted")` for named registry queries into
plans/<tag>/<query>_<suffix>.txt — the judge-auditable plan evidence.

Usage: python tools/plan_dump.py --tag=r13 --suffix=after query [query ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY  # noqa: E402
from qa_data_pipeline_rag_llm_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix, names = "r13", "after", []
    for a in sys.argv[1:]:
        if a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        else:
            names.append(a)
    out_dir = ROOT / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].spark(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(txt)
        print(f"wrote {path} ({len(txt)} chars)", flush=True)


if __name__ == "__main__":
    main()
