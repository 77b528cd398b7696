"""streaming.transitions: boundary pairs come from carried state
(multi-trigger ≡ batch), the out-of-order assertion, and NULL-tool
turns bypassing state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.streaming.job import (
    stream_transcripts,
    write_ordered_slices,
)
from log_formatter_spark.streaming.transitions import streaming_tool_pairs
from log_formatter_spark.transcripts import (
    tool_pairs,
    transcripts_from_events,
    transition_counts,
)


def _run_stream(spark, src, work):
    q = (
        streaming_tool_pairs(stream_transcripts(spark, src, max_files_per_trigger=1))
        .writeStream.format("parquet")
        .option("path", f"{work}/pairs")
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{work}/pairs")


def _rows(df):
    return sorted(
        (r["prev_tool"], r["tool"], r["n_pairs"], r["n_convs"], r["share_ppm"])
        for r in df.collect()
    )


def test_three_trigger_slicing_equals_batch(spark, sf_dir, tmp_path):
    """Three turn-range files, one per trigger: every conversation
    crosses TWO state boundaries and the final report still equals the
    batch operator row-for-row."""
    t = transcripts_from_events(spark, sf_dir)
    src = str(tmp_path / "in")
    write_ordered_slices(
        src,
        t.where(F.col("turn_idx") < 3),
        t.where((F.col("turn_idx") >= 3) & (F.col("turn_idx") < 6)),
        t.where(F.col("turn_idx") >= 6),
    )
    pairs = _run_stream(spark, src, str(tmp_path))
    assert _rows(transition_counts(pairs)) == _rows(
        transition_counts(tool_pairs(t))
    )


def test_boundary_pairs_need_state(spark, sf_dir, tmp_path):
    """Dropping the state carry would lose exactly the cross-file
    pairs: the streamed pair count equals batch, and batch > the sum
    of within-slice pair counts."""
    t = transcripts_from_events(spark, sf_dir)
    lo = t.where(F.col("turn_idx") < 3)
    hi = t.where(F.col("turn_idx") >= 3)
    n_batch = tool_pairs(t).count()
    n_within = tool_pairs(lo).count() + tool_pairs(hi).count()
    assert n_batch > n_within  # the boundary pairs exist
    src = str(tmp_path / "in")
    write_ordered_slices(src, lo, hi)
    assert _run_stream(spark, src, str(tmp_path)).count() == n_batch


def test_out_of_order_delivery_raises(spark, tmp_path):
    import datetime as dt

    rows_hi = [("c", 5, "user", "x", "bash", dt.datetime(2024, 1, 1))]
    rows_lo = [("c", 1, "user", "x", "grep", dt.datetime(2024, 1, 1))]
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz"
    )
    src = str(tmp_path / "in")
    spark.createDataFrame(rows_hi, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows_lo, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    with pytest.raises(Exception, match="out-of-order|StreamingQuery"):
        _run_stream(spark, src, str(tmp_path))


def test_null_tools_bypass_state(spark, tmp_path):
    """A NULL-tool turn between two tool turns across a boundary: the
    transition still links the tool-bearing neighbors."""
    import datetime as dt

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz"
    )
    ts = dt.datetime(2024, 1, 1)
    f1 = [("c", 0, "u", "x", "grep", ts), ("c", 1, "u", "x", None, ts)]
    f2 = [("c", 2, "u", "x", None, ts), ("c", 3, "u", "x", "bash", ts)]
    src = str(tmp_path / "in")
    write_ordered_slices(
        src, spark.createDataFrame(f1, schema), spark.createDataFrame(f2, schema)
    )
    pairs = _run_stream(spark, src, str(tmp_path)).collect()
    assert [(p["prev_tool"], p["tool"]) for p in pairs] == [("grep", "bash")]
