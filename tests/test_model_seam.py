"""Backend-injection seam for the model-shaped UDFs (VERDICT r01 #4).

The embed/generate udfs must accept a real model/endpoint through the
PUBLIC seam (parameter or env var) with zero module edits, while the
deterministic fakes stay the default so DuckDB oracles keep passing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.embed import (
    EMBED_BACKEND_ENV,
    default_embed_backend,
    make_embed_udf,
    resolve_embed_backend,
)
from qa_data_pipeline_rag_llm_spark.functions.llm import (
    MODEL_TAG,
    default_generate_backend,
    make_generate_udf,
    resolve_generate_backend,
)


def test_injected_embed_backend_runs_distributed(spark):
    """A custom encoder injected via the parameter seam drives the Arrow
    udf end-to-end (cloudpickle ships the closure to workers)."""
    udf = make_embed_udf(backend=lambda texts: [[float(len(t)), 1.5] for t in texts])
    df = spark.createDataFrame([("ab",), ("abcd",)], "t string")
    rows = {tuple(r.v) for r in df.select(udf("t").alias("v")).collect()}
    assert rows == {(2.0, 1.5), (4.0, 1.5)}


def test_injected_generate_backend_runs_distributed(spark):
    udf = make_generate_udf(backend=lambda prompts: [p.upper() for p in prompts])
    df = spark.createDataFrame([("hello",)], "t string")
    assert df.select(udf("t").alias("g")).first().g == "HELLO"


def test_env_seam_resolves_named_callable(monkeypatch):
    monkeypatch.setenv(
        EMBED_BACKEND_ENV,
        "qa_data_pipeline_rag_llm_spark.functions.embed:default_embed_backend",
    )
    assert resolve_embed_backend() is default_embed_backend
    monkeypatch.setenv(
        "SPARK_GRAFT_LLM_BACKEND",
        "qa_data_pipeline_rag_llm_spark.functions.llm:default_generate_backend",
    )
    assert resolve_generate_backend() is default_generate_backend


def test_default_backends_remain_the_oracle_fakes(spark):
    """No env, no parameter → the module-level udfs keep producing the
    deterministic fake output the oracles replay."""
    assert resolve_embed_backend() is default_embed_backend
    out = default_generate_backend(["hi"])[0]
    assert out.startswith(MODEL_TAG) and out.endswith("(2 chars)")
    df = spark.createDataFrame([("same text",), ("same text",)], "t string")
    from qa_data_pipeline_rag_llm_spark.functions.embed import embed_text

    vecs = [tuple(r.v) for r in df.select(embed_text("t").alias("v")).collect()]
    assert vecs[0] == vecs[1] and len(vecs[0]) == 8


def test_embed_backend_accepts_2d_ndarray(spark, tables):
    """A real SentenceTransformer.encode returns a 2-D ndarray — the seam
    must accept that shape, not just list-of-lists."""
    import numpy as np

    from qa_data_pipeline_rag_llm_spark.functions.embed import (
        EMBED_DIMS,
        make_embed_udf,
    )

    def ndarray_backend(texts):
        return np.ones((len(texts), EMBED_DIMS), dtype="float64")

    udf = make_embed_udf(backend=ndarray_backend)
    out = (
        tables["documents"]
        .limit(8)
        .select(udf("text").alias("emb"))
        .collect()
    )
    assert len(out) == 8
    assert all(len(r.emb) == EMBED_DIMS for r in out)
    assert all(v == 1.0 for v in out[0].emb)
