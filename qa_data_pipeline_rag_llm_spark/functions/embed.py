"""Embedding generation (M1) as an Arrow-batched pandas_udf.

The reference embeds with SentenceTransformer all-MiniLM-L6-v2 on CUDA
(``/root/reference/PLATFORM-contextual-Chunking.py:52-77``). That model is
not available here, so the DEFAULT backend is a DETERMINISTIC FAKE with
the same plumbing: batched Arrow transfer, per-executor "model" (the hash
closure), ``array<double>`` output.

Pluggable backend seam (VERDICT r01 #4): a backend is any callable
``(list[str]) -> list[list[float]]`` — the same batch shape as
``SentenceTransformer.encode``. Inject one of two ways, no module edits:

  * programmatic — ``make_embed_udf(backend=my_encode)``;
  * environment — ``SPARK_GRAFT_EMBED_BACKEND=pkg.module:callable``
    resolved at udf construction (driver side), shipped to executors via
    cloudpickle like any closure.

The default fake stays in place so the DuckDB oracles remain green:
v[d] = hexval(md5('{d}:' || normalize(text))[:8]) / 2^31 − 1.
"""

from __future__ import annotations

import hashlib
import importlib
import os
import re
import sys
from typing import Callable, Iterator

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

cloudpickle.register_pickle_by_value(sys.modules[__name__])

EMBED_DIMS = 8
EMBED_BACKEND_ENV = "SPARK_GRAFT_EMBED_BACKEND"

_NORM_RE = re.compile(r"[\W_]+", re.ASCII)  # re.ASCII: Python \W is Unicode by default, Java/RE2 are ASCII


def _normalize(text: str) -> str:
    """Python twin of functions.text.normalize_text: strip-before-lower
    so Unicode special-casing (İ → 'i'+combining dot under str.lower,
    like the JVM) can never reach the casing step — only ASCII does."""
    return _NORM_RE.sub(" ", text or "").lower().strip()


def _embed_one(text: str, dims: int) -> list[float]:
    norm = _normalize(text)
    return [
        int(hashlib.md5(f"{d}:{norm}".encode()).hexdigest()[:8], 16) / 2**31 - 1.0
        for d in range(dims)
    ]


def default_embed_backend(texts: list[str]) -> list[list[float]]:
    """The deterministic md5 fake, in backend batch shape."""
    return [_embed_one(t, EMBED_DIMS) for t in texts]


def resolve_embed_backend() -> Callable[[list[str]], list[list[float]]]:
    """Backend from ``$SPARK_GRAFT_EMBED_BACKEND`` (``module:callable``),
    or the deterministic fake when unset."""
    spec = os.environ.get(EMBED_BACKEND_ENV)
    if not spec:
        return default_embed_backend
    mod, _, attr = spec.partition(":")
    return getattr(importlib.import_module(mod), attr)


def make_http_embed_backend(
    url: str, timeout: float = 30.0, retries: int = 2
) -> Callable[[list[str]], list[list[float]]]:
    """Backend that POSTs each batch to an embedding endpoint — the
    production serving shape (a TEI/vLLM-style server in front of the
    real model, reference ``PLATFORM-contextual-Chunking.py:52-77``
    loads the model in-process instead).

    Wire format: request ``{"texts": [...]}``, response
    ``{"embeddings": [[...], ...]}`` — JSON over HTTP, stdlib only, so
    the closure cloudpickles to executors with zero dependencies. Each
    worker holds its own connection; transient failures retry with
    backoff (the seam twin of the reference's StackAPI backoff loop,
    ``STACK-Ingestion.py:43-63``)."""
    from qa_data_pipeline_rag_llm_spark.functions.httpjson import post_json

    def backend(texts: list[str]) -> list[list[float]]:
        out = post_json(url, {"texts": texts}, timeout, retries)
        return [[float(x) for x in v] for v in out["embeddings"]]

    return backend


_ST_MODEL = None


def st_embed_backend(texts: list[str]) -> list[list[float]]:
    """Real-weights SentenceTransformer backend for the env seam
    (``SPARK_GRAFT_EMBED_BACKEND=…:st_embed_backend``) — the reference's
    exact in-process model path (``PLATFORM-contextual-Chunking.py:
    52-77``). Lazily loads ``$SPARK_GRAFT_ST_MODEL`` (default
    all-MiniLM-L6-v2) ONCE per executor process and reuses it across
    Arrow batches. Requires ``sentence-transformers``; importing this
    module does not (the import lives inside the call), so the zero-dep
    default path is unaffected. Exercised by
    ``tests/test_real_encoder.py`` wherever the dependency exists."""
    global _ST_MODEL
    if _ST_MODEL is None:
        from sentence_transformers import SentenceTransformer

        _ST_MODEL = SentenceTransformer(
            os.environ.get("SPARK_GRAFT_ST_MODEL", "all-MiniLM-L6-v2")
        )
    return [[float(x) for x in v] for v in _ST_MODEL.encode(list(texts))]


def env_http_embed_backend(texts: list[str]) -> list[list[float]]:
    """Zero-arg-importable HTTP backend for the env seam: the endpoint
    URL travels via ``$SPARK_GRAFT_EMBED_URL`` so
    ``SPARK_GRAFT_EMBED_BACKEND=…:env_http_embed_backend`` needs no code
    changes anywhere."""
    url = os.environ.get("SPARK_GRAFT_EMBED_URL")
    if not url:
        raise RuntimeError("SPARK_GRAFT_EMBED_URL is not set")
    return make_http_embed_backend(url)(texts)


def make_embed_udf(
    backend: Callable[[list[str]], list[list[float]]] | None = None,
):
    """Build the Arrow-batched embedding udf around an injected backend
    (``None`` → env-resolved → fake). The Iterator form means per-executor
    init happens once per worker — where a real model's weights load."""
    resolved = backend or resolve_embed_backend()

    @F.pandas_udf(ArrayType(DoubleType()))
    def embed_text(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = resolved  # "model load" point: once per worker
        for batch in batches:
            vecs = model(batch.tolist())
            # SentenceTransformer.encode returns a 2-D ndarray, which
            # pd.Series rejects ("must be 1-dimensional") — normalize any
            # array-like-of-rows to a list of row lists first.
            if hasattr(vecs, "tolist") and getattr(vecs, "ndim", 1) == 2:
                vecs = vecs.tolist()
            yield pd.Series(list(vecs), index=batch.index)

    return embed_text


# Module-level default used by the registry plans: env-injected backend
# if configured at import, otherwise the oracle-checkable fake.
embed_text = make_embed_udf()
