"""Broadcast-join lookup enrichment (north-rule stage 2).

The reference has no join operator at all (SURVEY.md §2.5); the north
rule adds "broadcast-join enrichment keyed on role and tool". Lookup
dims are tiny (4–6 rows here; a few thousand at worst in production), so
the only sane physical plan at 100 TB is a broadcast hash join on each
key — no shuffle of the fact table. We hint ``broadcast()`` explicitly
rather than relying on ``autoBroadcastJoinThreshold`` so the plan is
stable regardless of stats availability on a fresh Iceberg snapshot.

Left joins: unmatched keys keep nulls (FIXTURES.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(df: DataFrame, lookup: DataFrame, on: str) -> DataFrame:
    """Left broadcast-join ``lookup`` onto ``df`` keyed on column ``on``."""
    return df.join(F.broadcast(lookup), on=on, how="left")


def enrich_role_tool(df: DataFrame, roles: DataFrame, tools: DataFrame) -> DataFrame:
    """The canonical north-rule enrichment: role then tool lookups.

    Two chained broadcast joins stay in one codegen stage — zero
    shuffles; the fact table is scanned exactly once.
    """
    return enrich(enrich(df, roles, "role"), tools, "tool")
