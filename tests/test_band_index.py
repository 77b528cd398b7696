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


def test_bucketed_probe_plan_is_one_sided(spark, docs, work):
    """The production bucketed layout: probing the (band, bh)-bucketed
    catalog table must shuffle ONLY the batch side — the parquet-path
    probe exchanges both sides, the bucketed probe exactly one fewer.
    Broadcast is disabled for the plan check because at gate scale the
    index fits the broadcast threshold and the join never sort-merges;
    at 100 TB the index side is the 16×-corpus-rows artifact and the
    SMJ shape below IS the production plan."""
    batch = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    table = "lfs_test_band_index_bucketed"
    dedup.write_band_index_bucketed(corpus, table, buckets=4)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        dedup.write_band_index(corpus, f"{work}/flat_idx")
        flat = dedup.probe_band_index(
            batch, spark.read.parquet(f"{work}/flat_idx"), n=3
        )
        bucketed = dedup.probe_band_index(batch, spark.table(table), n=3)
        # row-identical results
        assert {tuple(r) for r in bucketed.collect()} == {
            tuple(r) for r in flat.collect()
        }

        def plan_of(df):
            return df._jdf.queryExecution().executedPlan().toString()

        def n_exchanges(df):
            return plan_of(df).count("Exchange hashpartitioning")

        # strictly fewer exchanges (the exact count is AQE/session
        # dependent; the saved INDEX-side shuffle is the invariant)
        assert n_exchanges(bucketed) < n_exchanges(flat)
        assert "Bucketed: true" in plan_of(bucketed)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_bucketed_append_stays_bucket_aligned(spark, docs):
    """The production ingest cycle on the bucketed layout: append a
    batch via insertInto, then (a) a probe through the appended table
    equals the from-scratch rebuild row-for-row, and (b) the plan is
    STILL one-sided with the index side reading bucketed — i.e. the
    appended files landed bucket-aligned, not as unbucketed stragglers
    that would silently break bucket pruning."""
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    batch1 = docs.where((F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 2 == 0))
    batch2 = docs.where((F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 2 != 0))
    table = "lfs_test_band_index_append"
    dedup.write_band_index_bucketed(corpus, table, buckets=4)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        dedup.append_band_index_bucketed(batch1, table)
        got = _pairs(dedup.probe_band_index(batch2, spark.table(table), n=3))
        rebuilt = _pairs(
            dedup.incremental_neardup(batch2, corpus.unionByName(batch1), n=3)
        )
        assert got == rebuilt

        def plan_of(tbl):
            probe = dedup.probe_band_index(batch2, spark.table(tbl), n=3)
            return probe._jdf.queryExecution().executedPlan().toString()

        appended = plan_of(table)
        assert "Bucketed: true" in appended
        # appending must not ADD an exchange vs a from-scratch bucketed
        # rebuild of the same contents (batch-side exchanges — signature
        # agg, pair distinct — exist in both; an unbucket-aligned append
        # would surface as an extra index-side shuffle here)
        rebuilt_tbl = "lfs_test_band_index_rebuilt"
        dedup.write_band_index_bucketed(
            corpus.unionByName(batch1), rebuilt_tbl, buckets=4
        )
        try:
            fresh = plan_of(rebuilt_tbl)
            assert appended.count("Exchange hashpartitioning") == fresh.count(
                "Exchange hashpartitioning"
            )
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {rebuilt_tbl}")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
