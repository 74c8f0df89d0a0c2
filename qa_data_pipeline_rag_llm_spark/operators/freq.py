"""Mergeable frequent-items (heavy hitters) summaries — Misra-Gries.

The reference has no sketching at all (its scale caps at 10k posts,
SURVEY.md §6 / REDDIT-Ingestion.py:26-29); at 100 TB, "which keys are
hot" is a first-class planning input (salting decisions, cache
admission, abuse detection) and an exact global groupBy is exactly the
shuffle you want to avoid. Misra-Gries gives a map-only O(k)-memory
per-partition summary whose merge preserves the classic guarantees
(Agarwal et al., "Mergeable Summaries", PODS'12):

  * ``est(x) <= true(x)``                      (never overestimates)
  * ``true(x) - est(x) <= D``  where ``D`` = total decrement offset,
    and ``D <= N / (k + 1)``                   (bounded undercount)
  * any key with ``true(x) > N/(k+1)`` survives into the candidate set

Those three facts hold for EVERY partitioning of the input, which is
what makes the operator oracle-checkable even though the raw estimates
are partition-dependent: the registry query emits the guarantee
verdicts (detected / within-bound booleans), not the raw estimates.

Per-partition work is vectorized: each Arrow batch is reduced with
``value_counts`` (an exact, i.e. MG_inf, summary) and merged into the
running MG_k state via the offset trick — subtract the (k+1)-largest
weight from everyone, drop the non-positive — so the hot loop is
pandas/NumPy, never per-row Python.
"""

from __future__ import annotations

import sys
from typing import Iterator

import pandas as pd

from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the summarize closure references module globals (_merge_counts); ship
# the module by VALUE so executors need no importable package on their
# sys.path (the driver may run from any cwd — same convention as
# operators/diversify.py:40)
cloudpickle.register_pickle_by_value(sys.modules[__name__])

#: schema of the per-partition summary rows; ``key IS NULL`` rows carry
#: the partition's total decrement offset in ``dec`` (one per partition)
SUMMARY_SCHEMA = "key string, est long, dec long"


def _merge_counts(counters: dict, vc: "pd.Series", k: int) -> int:
    """Merge exact batch counts into MG_k state; return the offset."""
    for key, n in vc.items():
        counters[key] = counters.get(key, 0) + int(n)
    if len(counters) <= k:
        return 0
    # offset = (k+1)-th largest weight; subtracting it from everyone
    # leaves at most k strictly-positive counters
    offset = sorted(counters.values(), reverse=True)[k]
    for key in list(counters):
        counters[key] -= offset
        if counters[key] <= 0:
            del counters[key]
    return offset


def misra_gries_summaries(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition MG_k summaries of ``key_col`` as a DataFrame.

    Output rows: ``(key, est, 0)`` for each surviving candidate plus one
    ``(NULL, 0, total_offset)`` row per partition. Downstream merge is a
    plain groupBy-sum over at most ``partitions * (k + 1)`` rows —
    metadata-sized at any data scale.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        dec_total = 0
        for pdf in batches:
            dec_total += _merge_counts(
                counters, pdf[key_col].value_counts(), k
            )
        yield pd.DataFrame(
            {
                "key": list(counters) + [None],
                "est": [int(v) for v in counters.values()] + [0],
                "dec": [0] * len(counters) + [dec_total],
            }
        )

    return df.select(F.col(key_col).alias(key_col)).mapInPandas(
        summarize, schema=SUMMARY_SCHEMA
    )
