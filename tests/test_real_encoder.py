"""Real model weights through the embed seam (VERDICT r03 #6).

Runs M1+M4 with an ACTUAL SentenceTransformer — the reference's exact
model path (``PLATFORM-contextual-Chunking.py:52-77``) — wherever the
dependency exists: ``pytest.importorskip`` keeps the zero-dep sandbox
green while closing the "fake default" caveat on any box that has
``sentence-transformers`` installed (CI with the wheel, a dev laptop, a
cluster edge node). The seam under test is the same one the subprocess
HTTP encoder already proves (``test_model_backend_http.py``); this adds
the in-process real-weights variant.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

st = pytest.importorskip("sentence_transformers")


@pytest.fixture(scope="module")
def st_backend():
    from qa_data_pipeline_rag_llm_spark.functions.embed import (
        st_embed_backend,
    )

    try:  # weights may need a network the sandbox lacks
        st_embed_backend(["warmup"])
    except Exception as exc:  # noqa: BLE001
        pytest.skip(f"model weights unavailable: {exc}")
    return st_embed_backend


def test_env_seam_resolves_real_model(monkeypatch, st_backend):
    monkeypatch.setenv(
        "SPARK_GRAFT_EMBED_BACKEND",
        "qa_data_pipeline_rag_llm_spark.functions.embed:st_embed_backend",
    )
    from qa_data_pipeline_rag_llm_spark.functions.embed import (
        resolve_embed_backend,
    )

    vecs = resolve_embed_backend()(["hello world", "unrelated text"])
    assert len(vecs) == 2 and len(vecs[0]) >= 128  # real model dims
    assert vecs[0] != vecs[1]


def test_embed_documents_and_retrieve_with_real_model(
    spark, tables, st_backend
):
    """documents → Arrow udf over real weights → cosine top-1 returns
    the probe's own text at sim ≈ 1 (M1 + M4, nothing faked)."""
    from qa_data_pipeline_rag_llm_spark.functions.embed import (
        make_embed_udf,
    )
    from qa_data_pipeline_rag_llm_spark.operators.similarity import (
        cosine_topk,
    )

    udf = make_embed_udf(backend=st_backend)
    corpus = (
        tables["documents"]
        .limit(32)
        .select("doc_id", "text", udf("text").alias("embedding"))
    )
    texts = {r.doc_id: r.text for r in corpus.select("doc_id", "text").collect()}
    probe_row = corpus.select("doc_id", "text").first()
    probe = corpus.filter(F.col("doc_id") == probe_row.doc_id).select(
        F.lit(0).alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    hits = cosine_topk(corpus, probe, k=3, id_col="doc_id").collect()
    top = min(hits, key=lambda r: r.rank)
    assert texts[top.doc_id] == probe_row.text
    assert top.sim == pytest.approx(1.0, abs=1e-5)
