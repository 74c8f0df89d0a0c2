"""Stdlib-only JSON-over-HTTP POST with the engine's retry policy.

ONE copy of the policy both model backends (embed + generate) share —
pre-r03 each carried its own 15-line cascade that would drift on the
next change (review r03):

  * 4xx → fail fast (deterministic — retrying can never succeed, and a
    retried Arrow batch burns the full backoff schedule per executor);
  * malformed response body (KeyError/ValueError/TypeError in the
    caller's parse) → fail fast;
  * anything else (connection refused, 5xx, timeout) → exponential
    backoff, no dead sleep after the final attempt.

Stdlib only so closures built on it cloudpickle to executors with zero
dependencies. Transport is ``http://`` (urllib) or ``http+unix://``
(same HTTP bytes over an AF_UNIX socket — ``functions/unixhttp.py``);
both surface the same exception taxonomy, so the policy below has no
scheme branches.
"""

from __future__ import annotations

import time
import urllib.error
from typing import Any

from qa_data_pipeline_rag_llm_spark.functions.unixhttp import open_json


def post_json(
    url: str, payload: Any, timeout: float, retries: int
) -> Any:
    """POST ``payload`` as JSON to ``url`` and return the parsed JSON
    response, applying the retry policy above."""
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            return open_json(url, payload, timeout)
        except urllib.error.HTTPError as exc:
            if 400 <= exc.code < 500:  # deterministic — fail fast
                raise
            last = exc
        except ValueError:
            raise  # malformed response body (JSONDecodeError) — fail fast
        except Exception as exc:  # noqa: BLE001 — transient: retry
            last = exc
        if attempt < retries:  # no dead sleep after the final failure
            time.sleep(0.2 * (2**attempt))
    raise last  # type: ignore[misc]
