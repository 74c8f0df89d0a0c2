"""Python UDTF surface (Spark 4): lateral table function over text.

The reference has no UDTFs at all (SURVEY.md §2.12); this adds the
table-function API surface with a deterministic tokenizer so it stays
oracle-checkable. UDTFs are the Python slow path (per-row eval) — the
engine's hot-path tokenization lives in functions/text.py as built-in
expressions; this exists to cover the LATERAL + UDTF surface a user of
the engine may need for logic that genuinely can't be expressed as
column expressions.
"""

from __future__ import annotations

import re
import sys

# the VENDORED pickler Spark actually uses — registering by-value on the
# standalone cloudpickle package is a no-op for Spark serialization
# (review r03)
from pyspark import cloudpickle
from pyspark.sql.functions import udtf

_SPLIT = re.compile(r"[\W_]+", re.ASCII)  # ASCII \W: match Java/RE2 word-class semantics


@udtf(returnType="pos int, token string")
class Tokenize:
    """Lowercase alnum tokens with their 0-based position (split raw,
    lower after — tokens are pure ASCII so casing is engine-neutral)."""

    def eval(self, text: str):  # noqa: D102
        pos = 0
        for tok in _SPLIT.split(text or ""):
            if tok:
                yield pos, tok.lower()
                pos += 1


# Executors spawned by a driver launched outside /root/repo can't import
# this module by name; ship it by value (same pattern as streaming/events).
cloudpickle.register_pickle_by_value(sys.modules[__name__])
