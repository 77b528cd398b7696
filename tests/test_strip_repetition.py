"""Semantics of corpus.strip_repetition (within-doc repetition
stripping): the first occurrence of every repeated span survives, later
copies vanish, unique prose is untouched, and the operator never looks
across documents (a span repeated across docs but unique within each is
preserved everywhere — that's strip_boilerplate's job).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.operators import corpus

N = 3


@pytest.fixture(scope="module")
def out(spark):
    rows = [
        # a generation loop: the 5-token sentence repeats 3x
        (0, "the model said hello world the model said hello world the model said hello world"),
        # unique prose — must come back identical
        (1, "alpha bravo charlie delta echo foxtrot golf"),
        # the same span in two docs, once each: intra-doc rule keeps both
        (2, "common shared span here plus alpha tail"),
        (3, "common shared span here plus bravo tail"),
        # shorter than n tokens: no shingles, text preserved
        (4, "tiny doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["doc_id"]: r
        for r in corpus.strip_repetition(df, n=N).collect()
    }


def test_generation_loop_collapses_to_first_occurrence(out):
    r = out[0]
    assert r["clean_text"] == "the model said hello world"
    assert r["n_kept"] == 5
    assert r["n_tokens"] == 15


def test_unique_prose_untouched(out):
    assert out[1]["clean_text"] == "alpha bravo charlie delta echo foxtrot golf"
    assert out[1]["n_kept"] == out[1]["n_tokens"]


def test_cross_doc_repeats_preserved(out):
    # intra-doc rule only: the shared span survives in BOTH docs
    assert out[2]["clean_text"] == "common shared span here plus alpha tail"
    assert out[3]["clean_text"] == "common shared span here plus bravo tail"


def test_short_docs_pass_through(out):
    assert out[4]["clean_text"] == "tiny doc"
    assert out[4]["n_kept"] == 2


def test_idempotent_on_fixture(spark, sf_dir):
    """Stripping an already-stripped corpus changes nothing — the fixed
    point every rewrite operator should have."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    once = corpus.strip_repetition(docs, n=N).select(
        F.col("doc_id"), F.col("clean_text").alias("text")
    )
    twice = corpus.strip_repetition(once, n=N)
    changed = twice.where(F.col("n_kept") != F.col("n_tokens")).count()
    assert changed == 0
