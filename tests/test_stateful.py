"""Custom stateful operator (applyInPandasWithState): per-conversation
tracker with event-time idle timeout. Verifies state folds across
micro-batches, timeout-driven emission respects the watermark, and
still-live conversations stay in state (no premature emission)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from log_formatter_spark.streaming.state import track_conversations


def _t(minute: int) -> datetime:
    return datetime(2024, 1, 1, 10 + minute // 60, minute % 60, 0)


def test_idle_conversations_emit_once_with_folded_state(spark, tmp_path):
    # conv A: 3 turns ending t=5 (one ERROR); conv B: 2 turns ending
    # t=30; conv C: 2 turns ending t=120 (the watermark frontier).
    rows = [
        ("A", 0, "u", "2024-01-01 10:00:00 INFO [] hello turn=0", "", _t(0)),
        ("A", 1, "a", "2024-01-01 10:03:00 ERROR [] boom turn=1", "", _t(3)),
        ("A", 2, "a", "2024-01-01 10:05:00 INFO [] done turn=2", "", _t(5)),
        ("B", 0, "u", "2024-01-01 10:20:00 INFO [] hi turn=0", "", _t(20)),
        ("B", 1, "a", "2024-01-01 10:30:00 INFO [] ok turn=1", "", _t(30)),
        ("C", 0, "u", "2024-01-01 11:50:00 INFO [] late turn=0", "", _t(110)),
        ("C", 1, "a", "2024-01-01 12:00:00 INFO [] live turn=1", "", _t(120)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    src = str(tmp_path / "in")
    # two files -> two micro-batches, so A's state folds across batches:
    # A turns 0-1 + B turn 0 in file 1, the rest in file 2
    from log_formatter_spark.streaming.job import write_ordered_slices

    first = "(conv_id = 'A' AND turn_idx < 2) OR (conv_id = 'B' AND turn_idx = 0)"
    write_ordered_slices(src, df.where(first), df.where(f"NOT ({first})"))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # gap 10 min, watermark delay 1 min → final watermark 11:59.
    # A timed out (10:05 + 10 min < 11:59), B too (10:40 < 11:59),
    # C not (12:00 + 10 min > 11:59) — C must stay in state, unemitted.
    out = track_conversations(stream, idle_gap_ms=10 * 60 * 1000, watermark="1 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("conv_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["conv_id"]: (r["n_turns"], r["n_errors"], r["first_ts"], r["last_ts"])
        for r in spark.sql("SELECT * FROM conv_state").collect()
    }
    assert got == {
        "A": (3, 1, _t(0), _t(5)),  # folded across both micro-batches
        "B": (2, 0, _t(20), _t(30)),
    }
