"""Streaming near-dup ingest: per-row signatures must equal the grouped
batch form bit-for-bit, the streaming final table must equal the batch
incremental_neardup output under deep micro-batch slicing (one file per
trigger over 4 files), and pair state must survive a query restart.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.operators import dedup
from log_formatter_spark.streaming.dedup import streaming_neardup


@pytest.fixture()
def work():
    return tempfile.mkdtemp(prefix="lfs_stream_neardup_")


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_rowwise_minhash_equals_grouped(docs):
    grouped = {tuple(r) for r in dedup.minhash_signatures(docs).collect()}
    rowwise = {tuple(r) for r in dedup.rowwise_minhash(docs).collect()}
    assert rowwise == grouped


def test_rowwise_minhash_short_docs_dropped(spark):
    df = spark.createDataFrame(
        [(1, "only two"), (2, "three token doc"), (3, "")],
        "doc_id long, text string",
    )
    out = dedup.rowwise_minhash(df, n=3).collect()
    assert [r["doc_id"] for r in out] == [2]


def _run(spark, src, corpus, checkpoint, name):
    q = (
        streaming_neardup(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            corpus,
            n=3,
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
        (r["batch_doc"], r["corpus_doc"]): r["est_jaccard"]
        for r in spark.table(name).collect()
    }


def test_matches_batch_across_micro_batches(spark, docs, work):
    batch = docs.where(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 5 != 0).select("doc_id", "text")
    batch.repartition(4).write.mode("overwrite").parquet(f"{work}/in")
    got = _run(spark, f"{work}/in", corpus, f"{work}/ckpt", "lfs_neardup_t1")
    expected = {
        (r["batch_doc"], r["corpus_doc"]): r["est_jaccard"]
        for r in dedup.incremental_neardup(batch, corpus, n=3).collect()
    }
    assert got == expected
    assert got  # exercised


def test_pair_state_survives_restart(spark, docs, work):
    corpus = docs.where(F.col("doc_id") % 5 != 0).select("doc_id", "text")
    batch = docs.where(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    first = batch.where(F.col("doc_id") % 2 == 0)
    second = batch.where(F.col("doc_id") % 2 != 0)
    first.coalesce(1).write.mode("overwrite").parquet(f"{work}/in2")
    before = _run(spark, f"{work}/in2", corpus, f"{work}/ckpt2", "lfs_neardup_t2")
    second.coalesce(1).write.mode("append").parquet(f"{work}/in2")
    after = _run(spark, f"{work}/in2", corpus, f"{work}/ckpt2", "lfs_neardup_t2")
    # every pair discovered before the restart is still in the table
    assert set(before) <= set(after)
    expected = {
        (r["batch_doc"], r["corpus_doc"]): r["est_jaccard"]
        for r in dedup.incremental_neardup(batch, corpus, n=3).collect()
    }
    assert after == expected
    # resuming with NO new files fires zero triggers: the (per-query)
    # memory table stays empty rather than re-emitting — a resume never
    # double-processes consumed input (same exactly-once semantics as
    # test_streaming_incremental.py::test_state_survives_restart)
    again = _run(spark, f"{work}/in2", corpus, f"{work}/ckpt2", "lfs_neardup_t2")
    assert again == {}
