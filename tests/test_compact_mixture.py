"""compact_regenerations (LWW ingest compaction) and
mixture_temperature (Hamilton-apportioned temperature mixture):
version-order determinism, exact apportionment arithmetic, the
isqrt ≡ floor(sqrt(double)) bound the SQL twin relies on, and the
WindowGroupLimit prune in the selection plan.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from log_formatter_spark.operators.corpus import (
    _temperature_quotas,
    mixture_temperature,
)
from log_formatter_spark.transcripts import compact_regenerations

_TURN_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz"
)


def _turns(spark, rows):
    from datetime import datetime

    rows = [
        (*r[:5], datetime.fromisoformat(r[5]) if r[5] else None) for r in rows
    ]
    return spark.createDataFrame(rows, _TURN_SCHEMA)


def test_compact_keeps_latest_version(spark):
    rows = [
        ("c1", 0, "user", "v1", None, "2024-01-01 00:00:00"),
        ("c1", 0, "user", "v2 rewritten", None, "2024-01-01 00:00:05"),
        ("c1", 1, "assistant", "only write", "read", "2024-01-01 00:00:10"),
        ("c2", 0, "user", "a", None, "2024-01-01 00:00:00"),
        ("c2", 0, "user", "b", None, "2024-01-01 00:00:01"),
        ("c2", 0, "user", "c final", None, "2024-01-01 00:00:02"),
    ]
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in compact_regenerations(_turns(spark, rows)).collect()
    }
    assert len(out) == 3
    assert out[("c1", 0)]["text"] == "v2 rewritten"
    assert out[("c1", 0)]["n_versions"] == 2
    assert out[("c1", 1)]["text"] == "only write"
    assert out[("c1", 1)]["n_versions"] == 1
    assert out[("c2", 0)]["text"] == "c final"
    assert out[("c2", 0)]["n_versions"] == 3


def test_compact_equal_ts_tiebreak_matches_oracle_order(spark):
    """Two versions in the same microsecond: the winner is the one the
    (ts, md5_60(text)) order ranks last — computed independently here,
    so Spark's max-struct and the SQL twin's row_number provably pick
    the same row."""
    from log_formatter_spark.functions.hashing import md5_60

    rows = [
        ("c1", 0, "user", "alpha", None, "2024-01-01 00:00:00"),
        ("c1", 0, "user", "bravo", None, "2024-01-01 00:00:00"),
    ]
    df = _turns(spark, rows)
    hashes = {
        r["text"]: r["h"]
        for r in df.select("text", md5_60(F.col("text")).alias("h")).collect()
    }
    expect = max(hashes, key=hashes.get)
    got = compact_regenerations(df).collect()
    assert len(got) == 1
    assert got[0]["text"] == expect
    assert got[0]["n_versions"] == 2


def test_compact_drops_null_keyed_rows(spark):
    rows = [
        ("c1", 0, "user", "keep", None, "2024-01-01 00:00:00"),
        (None, 0, "user", "no conv", None, "2024-01-01 00:00:00"),
        ("c1", None, "user", "no idx", None, "2024-01-01 00:00:00"),
        ("c1", 1, "user", "no ts", None, None),
    ]
    got = compact_regenerations(_turns(spark, rows)).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in got] == [("c1", 0)]


def test_compact_empty_input(spark):
    df = spark.createDataFrame([], _TURN_SCHEMA)
    out = compact_regenerations(df)
    assert out.count() == 0
    assert out.columns == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "n_versions",
    ]


def test_streaming_compact_matches_batch_any_slicing(spark, tmp_path):
    """max(struct) and count(*) are commutative monoids, so the LITERAL
    batch operator runs on a complete-mode stream and ANY micro-batch
    slicing of the ingest log lands on the batch compacted table
    exactly (the theorem the streaming_compact contract row grades)."""
    rows = []
    for c in range(6):
        for i in range(4):
            rows.append(
                (f"c{c}", i, "user", f"base {c}/{i}", None,
                 f"2024-01-01 00:0{c}:0{i}")
            )
            if i % 2 == 0:
                rows.append(
                    (f"c{c}", i, "user", f"regen {c}/{i}", None,
                     f"2024-01-01 00:0{c}:1{i}")
                )
    df = _turns(spark, rows)
    src = str(tmp_path / "in")
    df.repartition(4).write.mode("overwrite").parquet(src)
    batch = sorted(
        tuple(r)
        for r in compact_regenerations(spark.read.parquet(src)).collect()
    )
    assert len(batch) == 24
    for mft in (1, 3):
        q = (
            compact_regenerations(
                spark.readStream.schema(df.schema)
                .option("maxFilesPerTrigger", mft)
                .parquet(src)
            )
            .writeStream.format("memory")
            .queryName(f"compact_{mft}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(tuple(r) for r in spark.table(f"compact_{mft}").collect())
        assert got == batch, mft


def test_temperature_quotas_hamilton_exact():
    # weights isqrt: 100->10, 49->7, 9->3; total 20; budget 10
    # floors: 100*?  10*10//20=5, 10*7//20=3, 10*3//20=1  -> sum 9
    # remainders: 100%20=0? (10*10)%20=0, (10*7)%20=10, (10*3)%20=10
    # leftover 1 -> tie on remainder 10 broken by source name: 'a' wins
    q = _temperature_quotas([("a", 49), ("b", 100), ("c", 9)], 10, 0.5)
    assert q == {"a": 4, "b": 5, "c": 1}
    assert sum(q.values()) == 10


def test_temperature_quotas_flatten_vs_proportional():
    """alpha=0.5 upweights the tail source relative to its raw share."""
    q = _temperature_quotas([("big", 10000), ("tail", 100)], 110, 0.5)
    # raw share would give tail ~1; sqrt share gives 110*10/110 = 10
    assert q["tail"] == 10
    assert sum(q.values()) == 110


def test_isqrt_equals_floor_sqrt_double():
    """The bound the SQL twin relies on (corpus._temperature_quotas
    docstring): floor(sqrt(double(n))) == isqrt(n) for realistic per-
    source counts, checked across magnitudes and around perfect
    squares."""
    ns = [1, 2, 3, 4, 99, 100, 101]
    for k in (10, 1000, 10**5, 10**7):
        ns += [k * k - 1, k * k, k * k + 1]
    for n in ns:
        assert math.floor(math.sqrt(float(n))) == math.isqrt(n), n


def test_mixture_temperature_selects_exact_quotas(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    budget = 60
    expect = _temperature_quotas(sorted(counts.items()), budget, 0.5)
    got = mixture_temperature(docs, budget=budget)
    per_source = {
        r["source"]: r["n"]
        for r in got.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_source == {s: q for s, q in expect.items() if q > 0}
    assert sum(per_source.values()) == budget
    # ranks are 1..quota with no gaps (exact hash-order draw)
    ranks = got.groupBy("source").agg(
        F.max("mix_rank").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    for r in ranks.collect():
        assert r["mx"] == r["n"]


def test_mixture_temperature_plan_has_group_limit_prune(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        mixture_temperature(docs, budget=30)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    # exactly one exchange: the window's hash partitioning on source
    assert plan.count("Exchange hashpartitioning") == 1


def test_mixture_temperature_empty_input(spark):
    docs = spark.createDataFrame([], "doc_id long, source string, text string")
    assert mixture_temperature(docs, budget=10).count() == 0
