"""Semantics of corpus.curation_funnel: six cumulative stages whose
counts are non-increasing, with each stage's count independently
recomputable from the operator primitives it composes. The contract
replica proves Spark≡DuckDB; these pin the stage semantics against the
primitives on the driver fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.functions.text import text_stats, tokens
from log_formatter_spark.operators import corpus
from log_formatter_spark.operators.dedup import norm_text_expr


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def rows(docs):
    out = corpus.curation_funnel(docs).collect()
    return {r["stage"]: r for r in sorted(out, key=lambda r: r["stage_idx"])}


def test_six_stages_in_order(rows):
    assert list(rows) == list(corpus.FUNNEL_STAGES)
    assert [rows[s]["stage_idx"] for s in rows] == list(range(6))


def test_counts_monotone_non_increasing(rows):
    seq = [rows[s] for s in corpus.FUNNEL_STAGES]
    for prev, cur in zip(seq, seq[1:]):
        assert cur["n_docs"] <= prev["n_docs"]
        assert cur["n_tokens"] <= prev["n_tokens"]


def test_raw_stage_is_the_whole_corpus(docs, rows):
    n = docs.count()
    tok = docs.select(
        F.sum(F.size(tokens(F.col("text"))).cast("bigint")).alias("t")
    ).collect()[0]["t"]
    assert rows["raw"]["n_docs"] == n
    assert rows["raw"]["n_tokens"] == tok


def test_lang_stage_matches_metadata_filter(docs, rows):
    assert rows["lang"]["n_docs"] == docs.where(F.col("lang") == "en").count()


def test_quality_stage_matches_text_stats(docs, rows):
    en = docs.where(F.col("lang") == "en")
    stats = text_stats(en)
    expected = stats.where(
        F.col("quality_score") >= corpus.MIN_QUALITY
    ).count()
    assert rows["quality"]["n_docs"] == expected


def test_exact_dedup_stage_counts_distinct_norm_texts(docs, rows):
    en = docs.where(F.col("lang") == "en")
    stats = text_stats(en).where(F.col("quality_score") >= corpus.MIN_QUALITY)
    survivors = en.join(stats.select("doc_id"), "doc_id")
    expected = (
        survivors.select(F.md5(norm_text_expr("text")).alias("k")).distinct().count()
    )
    assert rows["exact_dedup"]["n_docs"] == expected


def test_funnel_exercises_every_stage_on_fixture(rows):
    """The driver fixture must make every stage non-trivial (strict drop
    at lang + decontamination, some drop across the dedup tiers) so the
    report is a real funnel, not a constant column."""
    assert rows["lang"]["n_docs"] < rows["raw"]["n_docs"]
    assert rows["decontaminated"]["n_docs"] < rows["neardup"]["n_docs"]
    assert rows["decontaminated"]["n_docs"] > 0
