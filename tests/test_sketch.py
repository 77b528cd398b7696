"""KMV distinct sketch: accuracy against exact counts, the lossless
below-k path, and determinism across parallelism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from log_formatter_spark.functions.sketch import kmv_distinct


def test_kmv_accuracy_large_groups(spark):
    """Relative error within 5 standard errors (1/sqrt(k-2)) for groups
    far above k — deterministic data, so this can't flake."""
    k = 64
    df = spark.range(30_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        # ~10k distinct values per group
        F.col("id").alias("v"),
    )
    out = {r["g"]: (r["est_distinct"], r["is_exact"]) for r in
           kmv_distinct(df, "g", "v", k=k).collect()}
    assert set(out) == {"0", "1", "2"}
    for g, (est, is_exact) in out.items():
        assert not is_exact
        rel = abs(est - 10_000) / 10_000
        assert rel < 5 / math.sqrt(k - 2), (g, est, rel)


def test_kmv_exact_below_k(spark):
    df = spark.range(1000).select(
        F.lit("only").alias("g"), (F.col("id") % 17).alias("v")
    )
    [r] = kmv_distinct(df, "g", "v", k=64).collect()
    assert r["is_exact"] and r["est_distinct"] == 17.0


def test_kmv_duplicate_invariant(spark):
    """The sketch sees the distinct set: duplicating every row must not
    move the estimate."""
    base = spark.range(5000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    doubled = base.unionAll(base)
    [a] = kmv_distinct(base, "g", "v", k=32).collect()
    [b] = kmv_distinct(doubled, "g", "v", k=32).collect()
    assert a["est_distinct"] == b["est_distinct"]


def test_kmv_parallelism_invariant(spark):
    base = spark.range(20_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    [a] = kmv_distinct(base.repartition(1), "g", "v").collect()
    [b] = kmv_distinct(base.repartition(32), "g", "v").collect()
    assert a == b
