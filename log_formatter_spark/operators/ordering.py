"""Stable turn ordering (north-rule invariant).

The reference's worker fan-out races docs across N goroutine clones, so
cross-doc order is NOT preserved (agent/pipeline/pipeline.go:27-28,81-98).
The north rule demands per-turn text equality *under stable turn
ordering*, so the canonical order is a window over (conv_id, turn_idx).

At scale: the window partitions by conv_id — the same key as the
pipeline's hash(conv_id) repartition — so Catalyst reuses the existing
hash partitioning and the sort is per-partition only (no extra shuffle
when the upstream already clustered by conv_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_turn_order(df: DataFrame, out_col: str = "turn_order") -> DataFrame:
    """1-based dense position of each turn within its conversation."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn(out_col, F.row_number().over(w))


def canonical_order(df: DataFrame) -> DataFrame:
    """Canonical row order for equality checks (FIXTURES.md §6.1)."""
    return df.orderBy("conv_id", "turn_idx")
