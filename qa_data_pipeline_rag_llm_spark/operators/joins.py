"""Join operators: enrich-with-children (J1+A1), semi/anti (J2/P8).

The reference's single join pattern: group child comments to an id list,
left-join onto posts (``/root/reference/REDDIT-jointure.py:67-75``,
``STACK-jointure.py:69-73``). Its ``collect_list`` order is shuffle-
nondeterministic; we sort inside the aggregate (SURVEY.md §2.5 A1).

Scale notes: the grouped child side aggregates map-side before its shuffle;
the join is an equi-join Catalyst resolves to broadcast-hash when the
grouped side is small and sort-merge otherwise — both correct at 100 TB.
Semi joins replace the reference's pandas ``isin`` against a collected id
list (``PLATFORM-GenerationLLM.py:163-164``) — no driver collect, dedup-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_child_ids(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_fk: str,
    child_id: str,
    out_col: str = "comment_ids",
) -> DataFrame:
    """posts ⟕ (comments groupBy fk → sorted id array); drops the fk column
    like the reference (``REDDIT-jointure.py:75``)."""
    grouped = children.groupBy(child_fk).agg(
        F.sort_array(F.collect_list(child_id)).alias(out_col)
    )
    return parents.join(
        grouped, parents[parent_key] == grouped[child_fk], "left"
    ).drop(child_fk)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """Left semi join — set-membership filter (P8/J2)."""
    return left.join(right, on, "semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """Left anti join — negated membership (not present in the reference;
    part of the generic relational surface, SURVEY.md §7 stage 2)."""
    return left.join(right, on, "anti")
