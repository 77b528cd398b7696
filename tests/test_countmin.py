"""Semantics of sketch.countmin_heavy_hitters: the Count-Min theorem
(estimates never undershoot), observable collisions at the contract
width, and error shrinking as width grows — the property the report
exists to validate before a pipeline trusts a width/depth choice.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.functions import sketch


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def out(docs):
    return sketch.countmin_heavy_hitters(docs).collect()


def test_estimates_never_undershoot(out):
    assert out, "fixture must produce heavy hitters"
    for r in out:
        assert r["est_count"] >= r["exact_count"], r


def test_collisions_observable_at_contract_width(out):
    """width=256 over a ~900-bigram vocabulary guarantees collisions —
    if every estimate were exact the harness would be measuring an
    untested regime."""
    assert any(r["est_count"] > r["exact_count"] for r in out)


def test_wider_sketch_reduces_total_error(docs, out):
    wide = sketch.countmin_heavy_hitters(docs, width=16 * sketch.CM_WIDTH).collect()
    err = sum(r["est_count"] - r["exact_count"] for r in out)
    err_wide = sum(r["est_count"] - r["exact_count"] for r in wide)
    assert err_wide < err
    assert {r["shingle"] for r in wide} == {r["shingle"] for r in out}


def test_empty_corpus_yields_empty_report(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert sketch.countmin_heavy_hitters(df).count() == 0
    assert sketch.cm_counters(sketch.cm_shingles(df)).count() == 0


def test_streaming_counters_match_batch_any_slicing(spark, tmp_path):
    """Counter maintenance is a streaming SUM — associative and
    commutative — so ANY micro-batch slicing of the corpus must land on
    the BATCH counter table exactly (the theorem the
    streaming_countmin contract row grades at the driver)."""
    src = str(tmp_path / "in")
    docs = spark.createDataFrame(
        [
            (i, f"w{i % 7} w{(i * 3) % 7} w{i % 5} w{(i + 1) % 7}")
            for i in range(400)
        ],
        "doc_id long, text string",
    )
    docs.repartition(4).write.mode("overwrite").parquet(src)
    batch = sorted(
        tuple(r)
        for r in sketch.cm_counters(
            sketch.cm_shingles(spark.read.parquet(src))
        ).collect()
    )
    assert len(batch) > 0
    for mft in (1, 3):
        q = (
            sketch.cm_counters(
                sketch.cm_shingles(
                    spark.readStream.schema("doc_id long, text string")
                    .option("maxFilesPerTrigger", mft)
                    .parquet(src)
                )
            )
            .writeStream.format("memory")
            .queryName(f"cm_regs_{mft}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(tuple(r) for r in spark.table(f"cm_regs_{mft}").collect())
        assert got == batch, mft


def test_exact_counts_on_tiny_corpus(spark):
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c d")], "doc_id long, text string"
    )
    got = {
        r["shingle"]: (r["est_count"], r["exact_count"])
        for r in sketch.countmin_heavy_hitters(
            df, width=1024, min_count=1
        ).collect()
    }
    # bigrams: doc0 -> "a b","b a","a b"; doc1 -> "a b","b c","c d"
    assert got["a b"][1] == 3
    assert got["b a"][1] == 1
    assert got["b c"][1] == 1
    assert got["c d"][1] == 1
    for est, exact in got.values():
        assert est >= exact
