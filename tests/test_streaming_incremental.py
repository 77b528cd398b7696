"""Checkpoint/resume semantics of streaming_incremental_dedup: the
per-key dedup state must survive a query RESTART (new files arriving
after a stop resume against the same checkpoint), and re-running with
no new input must not change the final table (exactly-once)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.streaming.dedup import streaming_incremental_dedup


@pytest.fixture()
def work():
    return tempfile.mkdtemp(prefix="lfs_stream_inc_")


def _run(spark, src, corpus, checkpoint, name):
    q = (
        streaming_incremental_dedup(
            spark.readStream.schema("doc_id long, text string").parquet(src),
            corpus,
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        r["group_key"]: (r["survivor_id"], r["n_batch"], r["in_corpus"])
        for r in spark.table(name).collect()
    }


def test_state_survives_restart(spark, work):
    corpus = spark.createDataFrame(
        [(100, "gamma delta")], "doc_id long, text string"
    )
    src, ckpt = f"{work}/in", f"{work}/ckpt"
    first = spark.createDataFrame(
        [(3, "alpha beta"), (7, "gamma delta")], "doc_id long, text string"
    )
    first.coalesce(1).write.mode("append").parquet(src)
    t1 = _run(spark, src, corpus, ckpt, "inc_resume_1")

    # before restart: alpha-beta new (survivor 3), gamma-delta in corpus
    by_survivor = {v[0]: v for v in t1.values()}
    assert by_survivor[3][1:] == (1, False)
    assert by_survivor[7][1:] == (1, True)

    # new arrivals AFTER the stop: a dup of the first batch's key (id 1
    # -> lower than 3: min-aggregate must merge across the restart) and
    # a fresh doc
    spark.createDataFrame(
        [(1, "alpha  BETA!"), (9, "epsilon zeta")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    t2 = _run(spark, src, corpus, ckpt, "inc_resume_2")
    by_survivor = {v[0]: v for v in t2.values()}
    # the alpha-beta key now counts BOTH arrivals and the survivor
    # dropped to 1 — state crossed the restart
    assert by_survivor[1][1:] == (2, False)
    assert by_survivor[9][1:] == (1, False)
    assert by_survivor[7][1:] == (1, True)
    assert len(t2) == 3

    # resuming with NO new files fires zero triggers: the (per-query)
    # memory table stays empty rather than re-emitting — i.e. a resume
    # never double-processes consumed input (the checkpoint's offset
    # log is the exactly-once guarantee; a durable sink would simply
    # retain its last complete snapshot)
    t3 = _run(spark, src, corpus, ckpt, "inc_resume_3")
    assert t3 == {}


def test_matches_batch_operator(spark, work):
    """Streaming final table == the batch incremental_dedup reduced to
    the same (group_key, survivor, count, in_corpus) shape."""
    from log_formatter_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(50, "shared text"), (51, "corpus only")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1, "shared text"), (2, "batch dup"), (4, "batch  DUP"), (6, "solo")],
        "doc_id long, text string",
    )
    src = f"{work}/in2"
    batch.coalesce(2).write.mode("overwrite").parquet(src)
    t = _run(spark, src, corpus, f"{work}/ckpt2", "inc_batch_eq")

    b = incremental_dedup(batch=batch, corpus=corpus)
    expect = {
        r["group_key"]: (r["survivor_id"], r["n_batch"], r["in_corpus"])
        for r in b.groupBy("group_key")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count(F.lit(1)).alias("n_batch"),
            F.max(F.col("status") == "dup_of_corpus").alias("in_corpus"),
        )
        .collect()
    }
    assert t == expect


def test_stream_stream_join_across_micro_batches(spark, work):
    """A click and its purchase arriving in DIFFERENT micro-batches must
    still match: the click waits in join state until the purchase side
    catches up (maxFilesPerTrigger=1 over files written in order)."""
    import datetime as dt

    from log_formatter_spark.streaming.joins import streaming_attribution

    src = f"{work}/ss_in"
    base = dt.datetime(2024, 2, 1, 12, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    # file 1: clicks only; file 2: purchases only (some in window, some not)
    from log_formatter_spark.streaming.job import write_ordered_slices

    write_ordered_slices(
        src,
        spark.createDataFrame(
            [
                (1, base, 7, "click"),
                (2, base + dt.timedelta(minutes=50), 7, "click"),
                (3, base, 8, "click"),
            ],
            schema,
        ),
        spark.createDataFrame(
            [
                (10, base + dt.timedelta(minutes=55), 7, "purchase"),  # both clicks in 1h window
                (11, base + dt.timedelta(hours=3), 8, "purchase"),     # click 3 outside window
            ],
            schema,
        ),
    )

    def _stream(t):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .where(F.col("event_type") == t)
        )

    q = (
        streaming_attribution(_stream("click"), _stream("purchase"))
        .writeStream.format("memory")
        .queryName("ss_join_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["purchase_id"], r["click_id"], r["gap_us"])
        for r in spark.table("ss_join_mb").collect()
    }
    assert got == {
        (10, 1, 55 * 60 * 1_000_000),
        (10, 2, 5 * 60 * 1_000_000),
    }
