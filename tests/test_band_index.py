"""Maintained band index: probe-over-stored-index must equal the
recompute form row-for-row, and the append-per-ingest flow must equal
a from-scratch rebuild — the property ("signatures are deterministic,
appending never invalidates history") the incremental docstrings claim.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture()
def work():
    return tempfile.mkdtemp(prefix="lfs_band_index_")


def _pairs(df):
    return {(r["batch_doc"], r["corpus_doc"]): r["est_jaccard"] for r in df.collect()}


def test_probe_equals_recompute(spark, docs, work):
    batch = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    dedup.write_band_index(corpus, f"{work}/idx")
    index = spark.read.parquet(f"{work}/idx")
    got = _pairs(dedup.probe_band_index(batch, index, n=3))
    expected = _pairs(dedup.incremental_neardup(batch, corpus, n=3))
    assert got == expected
    assert got  # exercised


def test_append_ingest_flow_equals_rebuild(spark, docs, work):
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    batch1 = docs.where((F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 2 == 0))
    batch2 = docs.where((F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 2 != 0))
    path = f"{work}/idx"
    dedup.write_band_index(corpus, path)
    # ingest cycle 1: probe, then append the accepted batch's rows
    dedup.write_band_index(batch1, path, mode="append")
    # ingest cycle 2 probes corpus + batch1 through the APPENDED index
    got = _pairs(dedup.probe_band_index(batch2, spark.read.parquet(path), n=3))
    rebuilt = _pairs(
        dedup.incremental_neardup(batch2, corpus.unionByName(batch1), n=3)
    )
    assert got == rebuilt


def test_index_schema_is_the_verify_inline_layout(spark, docs, work):
    idx = dedup.band_index(docs.limit(50))
    assert idx.columns == (
        ["corpus_doc"] + [f"b{i}" for i in range(dedup.N_PERM)] + ["band", "bh"]
    )
