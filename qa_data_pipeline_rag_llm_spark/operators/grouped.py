"""Grouped-map and cogrouped-map pandas operators (batch side).

Completes the Python-execution surface next to the Arrow-batched scalar
UDFs (functions/embed.py), mapInPandas (operators/multimodal.py), and the
stateful streaming variants (streaming/events.py): ``applyInPandas`` for
per-group model fitting and ``cogroup().applyInPandas`` for two-sided
per-key reconciliation — the shapes built-in SQL genuinely can't express
when the per-group logic becomes imperative (here kept oracle-checkable
by computing closed-form statistics with exact integer sums).

Scale notes: both operators shuffle once on the grouping key and stream
one group at a time through a Python worker as Arrow batches — memory is
bounded by the largest single group, not the partition; skewed groups are
the thing to watch (same salting playbook as any hot key).
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

cloudpickle.register_pickle_by_value(sys.modules[__name__])

_TREND_DDL = "user_id bigint, n bigint, slope_per_day double"


def _fit_trend(pdf: pd.DataFrame) -> pd.DataFrame:
    """OLS slope of value vs event time for one user's rows.

    Exact-arithmetic discipline: sums are Python ints over integer
    series (relative seconds, micro-scaled values), and the final slope
    is one double expression — the same formula the SQL oracle runs, so
    the floats match bit-for-bit (see plans/queries_pandas_ops.py).
    Rounding discipline: pandas/Python round() is half-even, while both
    engines' round() is half-away-from-zero — so the micro-scaling here
    rounds half-away explicitly, and the final 6-dp rounding is NOT done
    here at all: the plan applies F.round, the oracle round(), i.e. one
    identical rounding on each side (ADVICE r01).
    """
    uid = int(pdf["user_id"].iloc[0])
    # worker-side Arrow→pandas lands as datetime64[ns]; pin to µs epoch
    ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
    t = ((ts_us - ts_us.min()) // 1_000_000).tolist()  # relative seconds
    scaled = pdf["value"].to_numpy() * 1_000_000.0
    v = (
        np.copysign(np.floor(np.abs(scaled) + 0.5), scaled)
        .astype("int64")
        .tolist()
    )
    n = len(t)
    if n < 2:
        return pd.DataFrame({"user_id": [uid], "n": [n], "slope_per_day": [None]})
    sx = sum(t)
    sy = sum(v)
    sxy = sum(a * b for a, b in zip(t, v))
    sxx = sum(a * a for a in t)
    denom = float(n * sxx - sx * sx)
    if denom == 0.0:
        return pd.DataFrame({"user_id": [uid], "n": [n], "slope_per_day": [None]})
    # micro-units/sec → units/day: ×86400 / 1e6 (unrounded; see docstring)
    slope = float(n * sxy - sx * sy) / denom / 1_000_000.0 * 86400.0
    return pd.DataFrame({"user_id": [uid], "n": [n], "slope_per_day": [slope]})


def fit_value_trend_per_user(events: DataFrame) -> DataFrame:
    """Per-user OLS value-over-time slope via grouped-map applyInPandas.

    Final rounding happens plan-side (F.round = HALF_UP) so it is the
    same half-away-from-zero rule the DuckDB oracle's round() applies.
    """
    fitted = (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(_fit_trend, schema=_TREND_DDL)
    )
    return fitted.withColumn("slope_per_day", F.round("slope_per_day", 6))


_RECON_DDL = (
    "user_id bigint, n_clicks bigint, n_purchases bigint, "
    "first_click_us bigint, first_purchase_us bigint, converted boolean"
)


def _reconcile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Cogrouped click/purchase reconciliation for one user."""
    if len(left):
        uid = int(left["user_id"].iloc[0])
    else:
        uid = int(right["user_id"].iloc[0])
    fc = (
        int(left["ts"].astype("datetime64[us]").astype("int64").min())
        if len(left)
        else None
    )
    fp = (
        int(right["ts_p"].astype("datetime64[us]").astype("int64").min())
        if len(right)
        else None
    )
    converted = fc is not None and fp is not None and fc <= fp
    return pd.DataFrame(
        {
            "user_id": [uid],
            "n_clicks": [len(left)],
            "n_purchases": [len(right)],
            "first_click_us": [fc],
            "first_purchase_us": [fp],
            "converted": [converted],
        }
    )


@F.pandas_udf(LongType())
def micro_sum_udaf(v: pd.Series) -> int:
    """Grouped-agg pandas UDAF (the aggregate UDF flavor next to scalar/
    iterator pandas_udfs and applyInPandas): exact micro-scaled integer
    sum of a double column. Scaling rounds half-away-from-zero to match
    both engines' round(); the sum itself is exact int64 arithmetic, so
    the aggregate is order-independent across partitions — the property
    any custom distributed aggregate must have."""
    scaled = v.dropna().to_numpy() * 1_000_000.0  # NULLs skip, like SUM
    # int64 BEFORE the reduction: a float64 .sum() loses exactness (and
    # order-independence) past 2^53 — exactly the at-scale regime.
    return int(
        np.copysign(np.floor(np.abs(scaled) + 0.5), scaled)
        .astype("int64")
        .sum()
    )


def user_value_micro_totals(events: DataFrame) -> DataFrame:
    """Per-user exact micro-unit value totals via the grouped-agg UDAF."""
    return events.groupBy("user_id").agg(
        micro_sum_udaf("value").alias("value_micro")
    )


def reconcile_clicks_purchases(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Two-sided per-user reconciliation via cogroup().applyInPandas —
    both inputs arrive pre-grouped per key in one Python call, without a
    join materializing the pairwise product first.

    The right side's value column is RENAMED (``ts`` → ``ts_p``) before
    the cogroup: when both children expose identically-named non-key
    columns, a downstream projection that reorders/prunes the udf OUTPUT
    makes Catalyst's column pruning drop the right child's copy of the
    shared name — the Python worker then receives the right group
    without its ``ts`` at all (reproduced on 4.1.2: plain ``collect()``
    fine, ``select(sorted(cols)).collect()``/``count()`` → KeyError;
    caught by the full sf0.01 sweep). Distinct names per side sidestep
    the mis-pruning; tests/test_cumulative.py::test_cogroup_survives_output_projection pins both action shapes."""
    return (
        clicks.select("user_id", "ts")
        .groupBy("user_id")
        .cogroup(
            purchases.select(
                "user_id", F.col("ts").alias("ts_p")
            ).groupBy("user_id")
        )
        .applyInPandas(_reconcile, schema=_RECON_DDL)
    )
