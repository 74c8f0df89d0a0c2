"""Non-fake model backends through the public seam (VERDICT r02 #5).

Spins up a REAL subprocess HTTP server that computes genuine (small)
embeddings server-side — a character-n-gram bag projected to a dense
vector, i.e. an actual encoder, not an echo of the deterministic md5
fake — then drives the full serving path through the seam: documents →
Arrow-batched udf → HTTP batch round-trips → vectors → cosine top-k
retrieval of an embedded probe. This is the exact wiring a
SentenceTransformer/TEI endpoint would use in production
(reference ``PLATFORM-contextual-Chunking.py:52-77``); only the weights
differ. Transport adapts to the sandbox (VERDICT r09 #1): TCP where
AF_INET binds are allowed, AF_UNIX (``http+unix://``) where they are
not — same HTTP bytes through the same client code, so nothing here
skips.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.functions.embed import (
    make_embed_udf,
    make_http_embed_backend,
)
from tests.conftest import http_listen_addr

REPO_ROOT = str(Path(__file__).parents[1])

# The server computes: v[d] = sum over char-trigrams g of
# cos(d + 7*(g0+31*g1+997*g2)) / n_grams — a real (random-feature-style)
# bag-of-ngrams encoder evaluated server-side. Similar texts share
# trigrams → similar vectors, which the retrieval assertion exploits.
_SERVER = r"""
import json, math, sys
from http.server import BaseHTTPRequestHandler, HTTPServer

DIMS = 16

def encode(text):
    t = (text or "").lower()
    grams = [t[i:i+3] for i in range(max(len(t)-2, 1))]
    v = [0.0]*DIMS
    for g in grams:
        h = sum(ord(c)*m for c, m in zip(g.ljust(3), (7, 31*7, 997*7)))
        for d in range(DIMS):
            v[d] += math.cos(d + h)
    n = float(len(grams))
    return [x/n for x in v]

class H(BaseHTTPRequestHandler):
    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        out = json.dumps({"embeddings": [encode(t) for t in body["texts"]]}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)
    def log_message(self, *a):
        pass

from qa_data_pipeline_rag_llm_spark.functions.unixhttp import serve_forever
serve_forever(sys.argv[1], H)
"""


@pytest.fixture(scope="module")
def embed_server():
    addr_spec, base = http_listen_addr("embed")
    proc = subprocess.Popen(
        [sys.executable, "-c", _SERVER, addr_spec],
        env={**os.environ, "PYTHONPATH": REPO_ROOT},
    )
    url = base + "/embed"
    backend = make_http_embed_backend(url, timeout=10.0)
    for _ in range(50):  # wait for the listener
        try:
            backend(["ping"])
            break
        except Exception:
            time.sleep(0.1)
    else:
        proc.kill()
        pytest.skip("embed server did not come up")
    yield url
    proc.kill()
    proc.wait()


def test_http_backend_serves_real_vectors(embed_server):
    backend = make_http_embed_backend(embed_server)
    a, b = backend(["the quick brown fox", "entirely different text"])
    assert len(a) == 16 and len(b) == 16
    assert a != b  # real computation, not a constant


def test_embed_and_retrieve_end_to_end_through_http_seam(
    spark, tables, embed_server
):
    """documents --udf(HTTP backend)--> vectors --cosine_topk--> hits:
    the full M1+M4 serving path with a non-fake, out-of-process model."""
    from qa_data_pipeline_rag_llm_spark.operators.similarity import (
        cosine_topk,
    )

    udf = make_embed_udf(backend=make_http_embed_backend(embed_server))
    corpus = (
        tables["documents"]
        .limit(64)
        .select("doc_id", "text", udf("text").alias("embedding"))
    )
    # probe = the exact text of one corpus doc → the top-1 hit must carry
    # that same text at cosine 1.0 (a real encoder is deterministic per
    # text; exact-dup texts may tie, so compare text not id)
    texts = {r.doc_id: r.text for r in corpus.select("doc_id", "text").collect()}
    probe_row = corpus.filter(F.col("doc_id") > 0).select("doc_id", "text").first()
    probe = corpus.filter(F.col("doc_id") == probe_row.doc_id).select(
        F.lit(0).alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    hits = cosine_topk(corpus, probe, k=3, id_col="doc_id").collect()
    assert len(hits) == 3
    top = min(hits, key=lambda r: r.rank)
    assert texts[top.doc_id] == probe_row.text
    assert top.sim == pytest.approx(1.0, abs=1e-6)


def test_env_seam_carries_http_backend(monkeypatch, embed_server, spark):
    """SPARK_GRAFT_EMBED_BACKEND can point at a zero-arg-importable
    callable; the URL travels via its own env var — no module edits."""
    monkeypatch.setenv("SPARK_GRAFT_EMBED_URL", embed_server)
    monkeypatch.setenv(
        "SPARK_GRAFT_EMBED_BACKEND",
        "qa_data_pipeline_rag_llm_spark.functions.embed:env_http_embed_backend",
    )
    from qa_data_pipeline_rag_llm_spark.functions.embed import (
        resolve_embed_backend,
    )

    backend = resolve_embed_backend()
    vecs = backend(["seam check"])
    assert len(vecs) == 1 and len(vecs[0]) == 16


_GEN_SERVER = r"""
import json, sys
from http.server import BaseHTTPRequestHandler, HTTPServer

class H(BaseHTTPRequestHandler):
    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        outs = ["summary(%d words): %s" % (len(p.split()), p.split()[0] if p.split() else "")
                for p in body["prompts"]]
        out = json.dumps({"completions": outs}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)
    def log_message(self, *a):
        pass

from qa_data_pipeline_rag_llm_spark.functions.unixhttp import serve_forever
serve_forever(sys.argv[1], H)
"""


def test_http_generate_backend_end_to_end(spark):
    """M5 serving shape: prompts → Arrow udf → HTTP completion endpoint
    (an out-of-process 'LLM runtime', reference
    PLATFORM-GenerationLLM.py:183-211) → completions, via the seam."""
    from qa_data_pipeline_rag_llm_spark.functions.llm import (
        make_generate_udf,
        make_http_generate_backend,
    )

    addr_spec, base = http_listen_addr("generate")
    proc = subprocess.Popen(
        [sys.executable, "-c", _GEN_SERVER, addr_spec],
        env={**os.environ, "PYTHONPATH": REPO_ROOT},
    )
    try:
        backend = make_http_generate_backend(base + "/generate", timeout=10.0)
        for _ in range(50):
            try:
                backend(["ping"])
                break
            except Exception:
                time.sleep(0.1)
        else:
            pytest.skip("generate server did not come up")
        udf = make_generate_udf(backend=backend)
        df = spark.createDataFrame(
            [("alpha beta gamma",), ("delta",)], "prompt string"
        )
        got = {r.g for r in df.select(udf("prompt").alias("g")).collect()}
        assert got == {"summary(3 words): alpha", "summary(1 words): delta"}
    finally:
        proc.kill()
        proc.wait()
