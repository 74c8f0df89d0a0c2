"""Top-k-per-group ranking (W1/O1) with deterministic tie-breaking.

The reference ranks comments per post with
``Window.partitionBy("parent_post_id").orderBy(col("score").desc())`` and
keeps rank ≤ 20 (``/root/reference/REDDIT-Nettoyage-Comms.py:63-67``,
``STACK-Nettoyage-Comms.py:95-99``). Ties on score make that
nondeterministic; this engine appends unique tie-break columns so results
are reproducible and oracle-hashable (SURVEY.md §2.6).

Scale note: row_number over a partitioned window is a single hash shuffle
on the group key plus a per-partition sort — the same cost shape at 100 TB,
with AQE handling skewed group keys. No driver involvement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
    keep_rank: bool = False,
) -> DataFrame:
    """Keep the top ``k`` rows per group. ``order_by`` must be a total order
    (pass a unique column last) for deterministic output."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)
