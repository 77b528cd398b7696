"""Streaming Bloom-filter membership: the stateless stream-static probe
must equal the batch bloom_membership output under deep micro-batch
slicing (one file per trigger over 4 files), and the plan must hold
ZERO streaming state — the property that distinguishes this twin from
every stateful streaming row in the repo.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.functions import sketch
from log_formatter_spark.operators.dedup import norm_text_expr
from log_formatter_spark.streaming.dedup import streaming_bloom_membership

M_BITS = 2048
K = 3


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def split(docs):
    key = F.md5(norm_text_expr("text"))
    batch = docs.where(F.col("doc_id") % 5 == 0).select(
        "doc_id", key.alias("key")
    )
    corpus = docs.where(F.col("doc_id") % 5 != 0).select(key.alias("key"))
    return batch, corpus


def _run_stream(spark, batch, corpus, name, n_files):
    work = tempfile.mkdtemp(prefix="lfs_stream_bloom_")
    src = f"{work}/in"
    batch.repartition(n_files).write.mode("overwrite").parquet(src)
    q = (
        streaming_bloom_membership(
            spark.readStream.schema("doc_id long, key string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            corpus,
            m=M_BITS,
            k=K,
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    return spark.table(name), progress


def test_stream_equals_batch_under_deep_slicing(spark, split):
    batch, corpus = split
    got, _ = _run_stream(spark, batch, corpus, "lfs_sbloom_t1", n_files=4)
    expected = sketch.bloom_membership(
        corpus_keys=corpus, batch_keys=batch, m=M_BITS, k=K
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in expected.collect()
    }


def test_probe_holds_zero_streaming_state(spark, split):
    batch, corpus = split
    _, progress = _run_stream(spark, batch, corpus, "lfs_sbloom_t2", n_files=2)
    ops = progress["stateOperators"] if progress else []
    assert ops == [], f"expected a stateless plan, got state operators: {ops}"


def test_no_false_negatives_on_stream_output(spark, split):
    batch, corpus = split
    got, _ = _run_stream(spark, batch, corpus, "lfs_sbloom_t3", n_files=2)
    bad = got.where(F.col("is_member") & ~F.col("bloom_hit")).count()
    assert bad == 0
