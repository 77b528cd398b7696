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


# --- HyperLogLog -------------------------------------------------------------


def test_hll_accuracy_across_cardinalities(spark):
    """Raw-regime relative error stays within ~3σ (σ = 1.04/√m) for
    cardinalities from 10·m to 1000·m at the production-ish p=10."""
    from log_formatter_spark.functions.sketch import hll_distinct

    p = 10
    sigma = 1.04 / (1 << (p // 2))  # 1.04/sqrt(1024)
    for n in (10_000, 100_000, 1_000_000):
        df = spark.range(n).select(
            F.lit("g").alias("g"), F.col("id").alias("v")
        )
        [row] = hll_distinct(df, "g", "v", p=p).collect()
        assert row["exact_distinct"] == n
        rel = abs(row["est_distinct"] - n) / n
        assert rel < 3 * sigma, (n, row["est_distinct"], rel)


def test_hll_duplicate_invariant(spark):
    from log_formatter_spark.functions.sketch import hll_distinct

    base = spark.range(5000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    [a] = hll_distinct(base, "g", "v", p=8).collect()
    [b] = hll_distinct(base.unionAll(base), "g", "v", p=8).collect()
    assert a["est_distinct"] == b["est_distinct"]


def test_hll_parallelism_invariant(spark):
    from log_formatter_spark.functions.sketch import hll_distinct

    base = spark.range(20_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    [a] = hll_distinct(base.repartition(1), "g", "v", p=6).collect()
    [b] = hll_distinct(base.repartition(32), "g", "v", p=6).collect()
    assert a == b


def test_hll_rank_word_arithmetic(spark):
    """The bucket/word split and leading-zero rank agree with a Python
    reimplementation over the real 60-bit hash values."""
    from log_formatter_spark.functions.hashing import md5_60
    from log_formatter_spark.functions.sketch import hll_distinct

    p, m = 5, 32
    df = spark.range(200).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    hashes = [
        r["h"]
        for r in df.select(
            md5_60(F.concat(F.col("v").cast("string"), F.lit(":hll"))).alias("h")
        ).collect()
    ]
    regs = {}
    for h in hashes:
        bucket, w = h % m, h // m
        rank = (60 - p) + 1 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rank)
    s = sum(1 << (61 - p - r) for r in regs.values()) + (m - len(regs)) * (
        1 << (61 - p)
    )
    from log_formatter_spark.functions.sketch import _hll_alpha

    expect = (_hll_alpha(m) * m * m * float(1 << (61 - p))) / float(s)
    [row] = hll_distinct(df, "g", "v", p=p).collect()
    assert row["est_distinct"] == expect


def test_hll_null_values_ignored(spark):
    from log_formatter_spark.functions.sketch import hll_distinct

    df = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", None)], "g string, v int"
    )
    [row] = hll_distinct(df, "g", "v", p=4).collect()
    assert row["exact_distinct"] == 2


def test_streaming_hll_registers_match_batch_any_slicing(spark, tmp_path):
    """The register aggregate is monotone, so ANY micro-batch slicing
    must land on the BATCH register table exactly."""
    from log_formatter_spark.functions.sketch import hll_registers

    src = str(tmp_path / "in")
    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v")
    )
    df.repartition(4).write.mode("overwrite").parquet(src)
    batch = sorted(
        tuple(r) for r in hll_registers(spark.read.parquet(src), "g", "v", p=6).collect()
    )
    for mft in (1, 3):
        q = (
            hll_registers(
                spark.readStream.schema("g string, v long")
                .option("maxFilesPerTrigger", mft)
                .parquet(src),
                "g",
                "v",
                p=6,
            )
            .writeStream.format("memory")
            .queryName(f"hll_regs_{mft}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(tuple(r) for r in spark.table(f"hll_regs_{mft}").collect())
        assert got == batch, mft
