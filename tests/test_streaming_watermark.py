"""Multi-trigger watermark semantics: redelivered rows are suppressed
(streaming dedup) and late rows are excluded from closed windows.

Both tests drive a REAL multi-batch run: two parquet files with
controlled modification times + maxFilesPerTrigger=1, so the watermark
advances between micro-batches exactly as it would across kafka
triggers in production.
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import Row
from pyspark.sql import functions as F

from log_formatter_spark.streaming.dedup import dedup_stream
from log_formatter_spark.streaming.job import (
    TRANSCRIPT_SCHEMA,
    stream_transcripts,
    streaming_hourly_counts,
)


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m)


def _turn(conv: str, idx: int, h: int, m: int = 0) -> Row:
    return Row(
        conv_id=conv, turn_idx=idx, role="user",
        text=f"2024-01-01 {h:02d}:{m:02d}:00 INFO [] hello world turn={idx}",
        tool="", ts=_ts(h, m),
    )


def _write_batches(spark, src, *batches):
    """Single-file batches with strictly increasing mtimes so the file
    source processes them in order (one micro-batch per file with
    maxFilesPerTrigger=1)."""
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
        path = os.path.join(src, f"b{i}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(path + ".tmp")
        part = [f for f in os.listdir(path + ".tmp") if f.endswith(".parquet")][0]
        os.replace(os.path.join(path + ".tmp", part), path)
        os.utime(path, (time.time() + i, time.time() + i))
    return src


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()


def test_stream_dedup_suppresses_redelivery(spark, tmp_path):
    src = str(tmp_path / "in")
    first = [_turn("c1", 1, 12), _turn("c1", 2, 12, 5)]
    # batch 2 redelivers turn (c1, 1) within the watermark and adds a new turn
    redelivered = [_turn("c1", 1, 12), _turn("c1", 3, 12, 30)]
    _write_batches(spark, src, first, redelivered)

    stream = stream_transcripts(spark, src, max_files_per_trigger=1)
    _run_to_memory(dedup_stream(stream, watermark="1 hour"), "dedup_out")
    got = sorted(
        (r["conv_id"], r["turn_idx"]) for r in spark.sql("SELECT * FROM dedup_out").collect()
    )
    assert got == [("c1", 1), ("c1", 2), ("c1", 3)]  # exactly once each


def test_late_row_excluded_from_closed_window(spark, tmp_path):
    """Measured Spark semantics this test pins (probed, then asserted):
    window EVICTION/emission uses the current trigger's watermark, but
    LATE-INPUT filtering uses the previous trigger's — so a row must be
    two watermark advances behind to be dropped. Batch 0 sets the
    frontier (12:00), batch 1 advances it (13:00) and closes the 10:00
    window, batch 2's late row (10:15) then arrives behind the
    now-effective 12:50 filter and is dropped."""
    src = str(tmp_path / "in")
    b0 = [_turn("c1", 1, 10, 0), _turn("c1", 2, 10, 30), _turn("c1", 3, 12, 0)]
    b1 = [_turn("c1", 4, 13, 0)]
    b2 = [_turn("c2", 1, 10, 15), _turn("c1", 5, 13, 30)]
    _write_batches(spark, src, b0, b1, b2)

    stream = stream_transcripts(spark, src, max_files_per_trigger=1)
    _run_to_memory(streaming_hourly_counts(stream, watermark="10 minutes"), "late_out")
    got = {
        (r["win"]["start"], r["role"]): r["n"]
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # 10:00 window closed WITHOUT the late row; 12:00 closed by the
    # 13:30 advance; 13:00 still open (end 14:00 > final watermark)
    assert got == {(_ts(10), "user"): 2, (_ts(12), "user"): 1}
