"""Streaming conversation content keys must agree exactly with the
batch gaps-and-islands computation on the same input (the same
streaming≡batch contract shape as tests/test_sessions.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_formatter_spark.operators.conversations import (
    conv_session_keys,
    streaming_conv_keys,
)
from log_formatter_spark.streaming import stream_transcripts
from log_formatter_spark.transcripts import transcripts_from_events


def test_streaming_conv_keys_match_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "in")
    t = transcripts_from_events(spark, sf_dir)
    t.write.mode("overwrite").parquet(src)
    canon = F.expr("substr(text, 21)")

    q = (
        streaming_conv_keys(stream_transcripts(spark, src), gap="30 minutes", canon=canon)
        .writeStream.format("memory")
        .queryName("conv_keys")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["conv_id"], r["win"]["start"]): (r["conv_key"], r["n_turns"])
        for r in spark.sql("SELECT * FROM conv_keys").collect()
    }
    want = {
        (r["conv_id"], r["session_start"]): (r["conv_key"], r["n_turns"])
        for r in conv_session_keys(t, gap="30 minutes", canon=canon).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_conv_keys_match_batch_out_of_order_ts(spark, tmp_path):
    # ts NOT monotone in turn_idx: session_window sessionizes by event
    # time, so the batch twin must too (turn-ordered lag() would merge
    # these into one session and diverge — the r3c review finding)
    rows = [
        ("a", 0, "u", "late", "", "2020-01-01 01:00:00"),
        ("a", 1, "u", "early", "", "2020-01-01 00:00:00"),  # 1h BEFORE turn 0
        ("a", 2, "u", "tail", "", "2020-01-01 01:10:00"),
    ]
    src = str(tmp_path / "ooo")
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts_s string",
    ).selectExpr(
        "conv_id", "turn_idx", "role", "text", "tool",
        "CAST(ts_s AS TIMESTAMP_NTZ) AS ts",
    )
    t.write.mode("overwrite").parquet(src)
    q = (
        streaming_conv_keys(stream_transcripts(spark, src), gap="30 minutes")
        .writeStream.format("memory")
        .queryName("conv_keys_ooo")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["conv_id"], r["win"]["start"]): (r["conv_key"], r["n_turns"])
        for r in spark.sql("SELECT * FROM conv_keys_ooo").collect()
    }
    want = {
        (r["conv_id"], r["session_start"]): (r["conv_key"], r["n_turns"])
        for r in conv_session_keys(t, gap="30 minutes").collect()
    }
    assert got == want
    assert len(want) == 2  # early turn is its own session


def test_streaming_conv_keys_dedup_downstream(spark, tmp_path):
    # two conversations with identical canonical content in distinct
    # sessions -> identical conv_key; a batch dedup over the emitted
    # keys collapses them (the downstream streaming-dedup contract)
    rows = [
        ("a", 0, "u", "hi", "", "2020-01-01 00:00:00"),
        ("a", 1, "x", "yo", "", "2020-01-01 00:01:00"),
        ("b", 0, "u", "hi", "", "2020-01-01 05:00:00"),
        ("b", 1, "x", "yo", "", "2020-01-01 05:01:00"),
        ("c", 0, "u", "other", "", "2020-01-01 00:00:00"),
    ]
    src = str(tmp_path / "in2")
    spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts_s string",
    ).selectExpr(
        "conv_id", "turn_idx", "role", "text", "tool",
        "CAST(ts_s AS TIMESTAMP_NTZ) AS ts",
    ).write.mode("overwrite").parquet(src)

    q = (
        streaming_conv_keys(stream_transcripts(spark, src), gap="30 minutes")
        .writeStream.format("memory")
        .queryName("conv_keys2")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    keys = spark.sql("SELECT conv_id, conv_key FROM conv_keys2").collect()
    assert len(keys) == 3
    by_key: dict[str, set[str]] = {}
    for r in keys:
        by_key.setdefault(r["conv_key"], set()).add(r["conv_id"])
    assert {"a", "b"} in by_key.values()  # retry collapsed to one key
    assert {"c"} in by_key.values()
