"""Embedding generation (M1) as an Arrow-batched pandas_udf.

The reference embeds with SentenceTransformer all-MiniLM-L6-v2 on CUDA
(``/root/reference/PLATFORM-contextual-Chunking.py:52-77``). That model is
not available here, so the udf is a DETERMINISTIC FAKE with the same
plumbing: batched Arrow transfer, per-executor "model" (the hash closure),
``array<double>`` output. Swapping in a real model changes only
``_embed_batch``'s body — the Spark-side contract (batching, schema,
broadcast pattern) is what this module tests.

The fake is md5-derived so the DuckDB oracle replays each dimension:
v[d] = hexval(md5('{d}:' || normalize(text))[:8]) / 2^31 − 1.
"""

from __future__ import annotations

import hashlib
import re
import sys
from typing import Iterator

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

cloudpickle.register_pickle_by_value(sys.modules[__name__])

EMBED_DIMS = 8

_NORM_RE = re.compile(r"[^a-z0-9]+")


def _normalize(text: str) -> str:
    """Python twin of functions.text.normalize_text (java regex and
    python re agree on this pattern over any unicode input)."""
    return _NORM_RE.sub(" ", (text or "").lower()).strip()


def _embed_one(text: str, dims: int) -> list[float]:
    norm = _normalize(text)
    return [
        int(hashlib.md5(f"{d}:{norm}".encode()).hexdigest()[:8], 16) / 2**31 - 1.0
        for d in range(dims)
    ]


@F.pandas_udf(ArrayType(DoubleType()))
def embed_text(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Batched embedding udf. The Iterator form initializes per-executor
    state once (where a real model would be loaded / broadcast weights
    deserialized) and streams Arrow batches through it."""
    dims = EMBED_DIMS  # "model load" happens here, once per worker
    for batch in batches:
        yield batch.map(lambda t: _embed_one(t, dims))
