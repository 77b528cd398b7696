"""Partitioning & skew mitigation (north-rule requirement).

The pipeline partitions by hash(conv_id); hot conversations (FIXTURES.md
§1: ~1% of convs own ~30% of turns; bench generator: one conv owns 10%)
would make one task a straggler. Mitigations, both deterministic (no
``rand()`` — FIXTURES.md invariant: salt must be a pure function of row
keys so routed-row equality holds across reruns and cluster sizes):

1. ``salted_repartition`` — repartition on (conv_id, salt) where
   salt = pmod(xxhash64(conv_id, turn_idx), n_salts): spreads a hot
   conversation over n_salts tasks for per-row work (parse/enrich/route
   are row-local, so correctness is unaffected by the split).
2. ``salted_count`` — two-stage aggregation for per-conv_id aggregates:
   partial agg on (conv_id, salt), final agg on conv_id. The first
   stage shrinks the hot key by n_salts× before the key-only shuffle.

AQE skew-join/coalesce (session.py) is the runtime safety net on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(n_salts: int, *key_cols: str) -> Column:
    """Deterministic salt in [0, n_salts) from row keys (never rand())."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_salts)).cast("int")


def salted_repartition(
    df: DataFrame, num_partitions: int, n_salts: int = 16
) -> DataFrame:
    """hash(conv_id) partitioning with salted hot-key spreading."""
    return df.repartition(
        num_partitions, F.col("conv_id"), salt_col(n_salts, "conv_id", "turn_idx")
    )


def salted_count(df: DataFrame, key: str = "conv_id", n_salts: int = 16) -> DataFrame:
    """Two-stage skew-proof count per key; result equals plain
    groupBy(key).count() exactly (oracle-checkable)."""
    salted = df.groupBy(
        F.col(key), salt_col(n_salts, key, "turn_idx").alias("_salt")
    ).agg(F.count(F.lit(1)).alias("_partial"))
    return salted.groupBy(key).agg(F.sum("_partial").alias("n_turns"))
