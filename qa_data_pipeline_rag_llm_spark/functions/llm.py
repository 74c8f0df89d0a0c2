"""Batch LLM generation (M5) as an Arrow-batched pandas_udf.

The reference calls Ollama llama3.2 per prompt from the driver
(``/root/reference/PLATFORM-GenerationLLM.py:183-211``, ``app2.py:166-178``
— temperature 0.3, num_ctx 4096, num_predict 1000). In-engine, batch
generation is a ``pandas_udf`` calling an inference endpoint from each
executor (SURVEY.md M5) so a 100 TB corpus generates in parallel instead
of through one driver loop.

No inference endpoint exists in this environment, so the DEFAULT client
is a DETERMINISTIC FAKE that tags the prompt and echoes its head — the
Spark-side contract (Arrow batching, per-executor client init, column
shapes) is real and oracle-checkable.

Pluggable backend seam (VERDICT r01 #4): a backend is any callable
``(list[str]) -> list[str]`` (prompts in, completions out). Inject
programmatically via ``make_generate_udf(backend=...)`` or through
``SPARK_GRAFT_LLM_BACKEND=pkg.module:callable`` — e.g. a user module
whose callable POSTs each batch to their own inference endpoint. The
fake stays the default so oracles stay green.
"""

from __future__ import annotations

import importlib
import os
import sys
from typing import Callable, Iterator

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

cloudpickle.register_pickle_by_value(sys.modules[__name__])

MODEL_TAG = "[llama3.2|t=0.3]"
ECHO_CHARS = 48
LLM_BACKEND_ENV = "SPARK_GRAFT_LLM_BACKEND"


def _generate_one(prompt: str) -> str:
    p = prompt or ""
    return f"{MODEL_TAG} {p[:ECHO_CHARS]} ({len(p)} chars)"


def default_generate_backend(prompts: list[str]) -> list[str]:
    """The deterministic fake, in backend batch shape."""
    return [_generate_one(p) for p in prompts]


def resolve_generate_backend() -> Callable[[list[str]], list[str]]:
    """Backend from ``$SPARK_GRAFT_LLM_BACKEND`` (``module:callable``),
    or the deterministic fake when unset."""
    spec = os.environ.get(LLM_BACKEND_ENV)
    if not spec:
        return default_generate_backend
    mod, _, attr = spec.partition(":")
    return getattr(importlib.import_module(mod), attr)


def make_http_generate_backend(
    url: str, timeout: float = 60.0, retries: int = 2
) -> Callable[[list[str]], list[str]]:
    """Backend that POSTs prompt batches to a completion endpoint — the
    production serving shape for M5 (the reference calls a local LLM
    runtime in-process instead, ``PLATFORM-GenerationLLM.py:183-211``).
    Wire format: ``{"prompts": [...]}`` → ``{"completions": [...]}``;
    stdlib-only so the closure cloudpickles to executors."""
    from qa_data_pipeline_rag_llm_spark.functions.httpjson import post_json

    def backend(prompts: list[str]) -> list[str]:
        out = post_json(url, {"prompts": prompts}, timeout, retries)
        return [str(c) for c in out["completions"]]

    return backend


def make_generate_udf(
    backend: Callable[[list[str]], list[str]] | None = None,
):
    """Build the Arrow-batched generation udf around an injected backend
    (``None`` → env-resolved → fake)."""
    resolved = backend or resolve_generate_backend()

    @F.pandas_udf(StringType())
    def generate_text(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        client = resolved  # per-executor client construction point
        for batch in batches:
            yield pd.Series(client(batch.tolist()), index=batch.index)

    return generate_text


# Module-level default used by the registry plans.
generate_text = make_generate_udf()


def oracle_generate(prompt_expr: str) -> str:
    """DuckDB twin of the fake client, for golden tests."""
    return (
        f"'{MODEL_TAG} ' || substr({prompt_expr}, 1, {ECHO_CHARS})"
        f" || ' (' || length({prompt_expr}) || ' chars)'"
    )
