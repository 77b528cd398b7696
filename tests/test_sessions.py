"""Sessionization: batch gaps-and-islands vs the native streaming
session_window must agree exactly on the same input."""

from __future__ import annotations

from log_formatter_spark.operators.sessions import (
    conversation_sessions,
    streaming_sessions,
)
from log_formatter_spark.streaming import stream_transcripts
from log_formatter_spark.transcripts import transcripts_from_events


def test_streaming_sessions_match_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "in")
    t = transcripts_from_events(spark, sf_dir)
    t.write.mode("overwrite").parquet(src)

    q = (
        streaming_sessions(stream_transcripts(spark, src), gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["conv_id"], r["win"]["start"]): r["n_turns"]
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    want = {
        (r["conv_id"], r["session_start"]): r["n_turns"]
        for r in conversation_sessions(t, gap="30 minutes").collect()
    }
    assert got == want


def test_sessions_split_on_gap(spark):
    rows = [
        ("c1", 0, "u", "x", "", "2020-01-01 00:00:00"),
        ("c1", 1, "u", "x", "", "2020-01-01 00:10:00"),
        ("c1", 2, "u", "x", "", "2020-01-01 01:00:00"),  # 50 min gap -> new session
        ("c2", 0, "u", "x", "", "2020-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts_s string"
    ).selectExpr("conv_id", "turn_idx", "role", "text", "tool", "CAST(ts_s AS TIMESTAMP_NTZ) AS ts")
    out = {
        (r["conv_id"], r["sess_id"]): r["n_turns"]
        for r in conversation_sessions(df, gap="30 minutes").collect()
    }
    assert out == {("c1", 1): 2, ("c1", 2): 1, ("c2", 1): 1}
