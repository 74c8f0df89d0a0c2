"""Real-compute encoder through the embed seam (VERDICT r03 #6, r08 #3).

Two tiers, same seam (``$SPARK_GRAFT_EMBED_BACKEND`` →
``make_embed_udf``'s Arrow iterator):

* ALWAYS-ON: the vendored deterministic NumPy transformer
  (``functions/np_encoder.py``) — genuine matmul/attention/layernorm
  forward pass with fixed seeded weights, so the sandbox exercises a
  real dense-linear-algebra encoder without network or wheels. This was
  an env-gated skip from r3 through r8.
* ENV-GATED: an actual SentenceTransformer — the reference's exact
  model path (``PLATFORM-contextual-Chunking.py:52-77``) — wherever the
  dependency + weights exist (CI with the wheel, a cluster edge node).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

NP_BACKEND = (
    "qa_data_pipeline_rag_llm_spark.functions.np_encoder:np_embed_backend"
)


# --------------------------------------------------------------------------
# Vendored NumPy transformer — always on


def test_np_encoder_is_a_real_transformer_forward():
    """Not a hash fake: attention must mix token information, so token
    ORDER changes the vector (a bag-of-hashes embedding can't), while
    the same text is bit-reproducible across calls and batch layouts."""
    from qa_data_pipeline_rag_llm_spark.functions.np_encoder import encode

    a = encode(["the cat sat on the mat"])[0]
    b = encode(["mat the on sat cat the"])[0]
    assert not np.allclose(a, b), "order-insensitive -> not attention"
    again = encode(["the cat sat on the mat", "padding partner text"])[0]
    assert np.allclose(a, again, atol=1e-6), "batch layout changed result"
    assert np.linalg.norm(a) == pytest.approx(1.0, abs=1e-5)


def test_env_seam_resolves_np_encoder(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_EMBED_BACKEND", NP_BACKEND)
    from qa_data_pipeline_rag_llm_spark.functions.embed import (
        resolve_embed_backend,
    )

    vecs = resolve_embed_backend()(["hello world", "unrelated text"])
    assert len(vecs) == 2 and len(vecs[0]) == 384
    assert vecs[0] != vecs[1]


def test_embed_documents_and_retrieve_with_np_encoder(spark, tables):
    """documents → Arrow udf over the matmul encoder → cosine top-1
    returns the probe's own text at sim ≈ 1 (M1 + M4, genuine forward
    pass end to end in executor workers)."""
    from qa_data_pipeline_rag_llm_spark.functions.embed import (
        make_embed_udf,
    )
    from qa_data_pipeline_rag_llm_spark.functions.np_encoder import (
        np_embed_backend,
    )
    from qa_data_pipeline_rag_llm_spark.operators.similarity import (
        cosine_topk,
    )

    udf = make_embed_udf(backend=np_embed_backend)
    corpus = (
        tables["documents"]
        .orderBy("doc_id")  # limit() without order is a nondeterministic subset
        .limit(32)
        .select("doc_id", "text", udf("text").alias("embedding"))
    )
    texts = {
        r.doc_id: r.text for r in corpus.select("doc_id", "text").collect()
    }
    probe_row = corpus.select("doc_id", "text").first()
    probe = corpus.filter(F.col("doc_id") == probe_row.doc_id).select(
        # probe_id must not collide with any doc_id: cosine_topk excludes
        # id_col == probe_id rows, and doc_ids start at 0
        F.lit(-1).alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    hits = cosine_topk(corpus, probe, k=3, id_col="doc_id").collect()
    top = min(hits, key=lambda r: r.rank)
    assert texts[top.doc_id] == probe_row.text
    assert top.sim == pytest.approx(1.0, abs=1e-5)


# --------------------------------------------------------------------------
# Actual SentenceTransformer — env-gated (wheel + weights required)


@pytest.fixture(scope="module")
def st_backend():
    pytest.importorskip("sentence_transformers")
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
    """Same plumbing as the NumPy-encoder test, real weights."""
    from qa_data_pipeline_rag_llm_spark.functions.embed import (
        make_embed_udf,
    )
    from qa_data_pipeline_rag_llm_spark.operators.similarity import (
        cosine_topk,
    )

    udf = make_embed_udf(backend=st_backend)
    corpus = (
        tables["documents"]
        .orderBy("doc_id")  # limit() without order is a nondeterministic subset
        .limit(32)
        .select("doc_id", "text", udf("text").alias("embedding"))
    )
    texts = {
        r.doc_id: r.text for r in corpus.select("doc_id", "text").collect()
    }
    probe_row = corpus.select("doc_id", "text").first()
    probe = corpus.filter(F.col("doc_id") == probe_row.doc_id).select(
        # probe_id must not collide with any doc_id: cosine_topk excludes
        # id_col == probe_id rows, and doc_ids start at 0
        F.lit(-1).alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    hits = cosine_topk(corpus, probe, k=3, id_col="doc_id").collect()
    top = min(hits, key=lambda r: r.rank)
    assert texts[top.doc_id] == probe_row.text
    assert top.sim == pytest.approx(1.0, abs=1e-5)


def test_np_encoder_truncates_at_max_tokens():
    """Texts differing only past the MAX_TOKENS cap embed identically
    (the documented truncation), while a difference INSIDE the window
    changes the vector."""
    from qa_data_pipeline_rag_llm_spark.functions.np_encoder import (
        MAX_TOKENS,
        encode,
    )

    base = " ".join(f"w{i}" for i in range(MAX_TOKENS))
    a = encode([base + " extra tail tokens beyond the cap"])[0]
    b = encode([base + " completely different suffix here"])[0]
    c = encode(["DIFFERENT " + base])[0]
    assert np.allclose(a, b), "past-cap divergence must not matter"
    assert not np.allclose(a, c), "in-window divergence must matter"


def test_np_encoder_matches_golden_vectors():
    """Numeric parity harness (VERDICT r09 ask #7): five frozen inputs
    and their full 384-d outputs, generated at r10 HEAD and committed
    as tests/golden/np_encoder_golden.json. Any change to the
    tokenizer, weights seed, attention, or pooling shifts these values
    and fails here — previously only shapes/determinism were pinned.
    Tolerance is 1e-6 absolute (values are O(0.05)): loose enough to
    survive a BLAS swap's ULP jitter inside numpy's matmul, tight
    enough that any semantic change to the encoder is far outside it."""
    import json
    from pathlib import Path

    from qa_data_pipeline_rag_llm_spark.functions.np_encoder import encode

    golden = json.loads(
        (Path(__file__).parent / "golden" / "np_encoder_golden.json")
        .read_text()
    )
    got = encode(golden["texts"])
    want = np.asarray(golden["vectors"], dtype=np.float64)
    assert got.shape == want.shape == (5, 384)
    assert np.allclose(np.asarray(got, dtype=np.float64), want, atol=1e-6, rtol=0)
