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
