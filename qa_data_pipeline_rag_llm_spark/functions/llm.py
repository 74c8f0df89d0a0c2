"""Batch LLM generation (M5) as an Arrow-batched pandas_udf.

The reference calls Ollama llama3.2 per prompt from the driver
(``/root/reference/PLATFORM-GenerationLLM.py:183-211``, ``app2.py:166-178``
— temperature 0.3, num_ctx 4096, num_predict 1000). In-engine, batch
generation is a ``pandas_udf`` calling an inference endpoint from each
executor (SURVEY.md M5) so a 100 TB corpus generates in parallel instead
of through one driver loop.

No inference endpoint exists in this environment, so the default client
is a DETERMINISTIC FAKE that tags the prompt and echoes its head — the
Spark-side contract (Arrow batching, per-executor client init, column
shapes) is real and oracle-checkable. Swapping in a real endpoint changes
only ``_generate_batch``.
"""

from __future__ import annotations

import sys
from typing import Iterator

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

cloudpickle.register_pickle_by_value(sys.modules[__name__])

MODEL_TAG = "[llama3.2|t=0.3]"
ECHO_CHARS = 48


def _generate_one(prompt: str) -> str:
    p = prompt or ""
    return f"{MODEL_TAG} {p[:ECHO_CHARS]} ({len(p)} chars)"


@F.pandas_udf(StringType())
def generate_text(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Batched generation udf (iterator form: the real HTTP client / model
    handle would be constructed once per executor, here)."""
    for batch in batches:
        yield batch.map(_generate_one)


def oracle_generate(prompt_expr: str) -> str:
    """DuckDB twin of the fake client, for golden tests."""
    return (
        f"'{MODEL_TAG} ' || substr({prompt_expr}, 1, {ECHO_CHARS})"
        f" || ' (' || length({prompt_expr}) || ' chars)'"
    )
