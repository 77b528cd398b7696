"""Sequence packing + chunking: brute-force Python spec checks of the
invariants the window/explode arithmetic must satisfy, plus plan and
empty-input coverage."""

from __future__ import annotations

from pyspark.sql import Row

from log_formatter_spark.operators.packing import (
    chunk_docs,
    pack_sequences,
)


def test_pack_matches_bruteforce(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budget = 256
    got = {r["doc_id"]: r for r in pack_sequences(docs, budget=budget).collect()}
    # brute force: group docs by their assigned bucket, concatenate in
    # doc_id order, track the running token offset
    by_bucket: dict[int, list[int]] = {}
    for d in sorted(got):
        by_bucket.setdefault(got[d]["bucket"], []).append(d)
    for bucket, ds in by_bucket.items():
        pos = 0
        for d in ds:
            r = got[d]
            assert (r["seq_id"], r["seq_offset"]) == (pos // budget, pos % budget), d
            pos += r["n_tokens"]


def test_pack_tokens_never_lost(spark, sf_dir):
    """Σ n_tokens per bucket == the last doc's start + its tokens —
    streaming concatenation loses and pads nothing."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pack_sequences(docs).collect()
    from log_formatter_spark.functions.text import tokens
    from pyspark.sql import functions as F

    expect = docs.select(F.sum(F.size(tokens(F.col("text"))))).first()[0]
    assert sum(r["n_tokens"] for r in out) == expect


def test_chunks_cover_and_overlap(spark):
    rows = [
        Row(doc_id=0, text=" ".join(f"w{i}" for i in range(10))),  # n=10
        Row(doc_id=1, text="a b c"),  # shorter than k -> one chunk
        Row(doc_id=2, text=""),  # empty -> no chunks
    ]
    out = chunk_docs(spark.createDataFrame(rows), k=4, s=3).collect()
    by_doc: dict[int, dict[int, str]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk_text"]
    # n=10, k=4, s=3: starts 0,3,6,9 -> ceil(6/3)+1 = 3? (10-4=6, 6/3=2, +1=3)
    assert by_doc[0] == {
        0: "w0 w1 w2 w3",
        1: "w3 w4 w5 w6",
        2: "w6 w7 w8 w9",
    }
    assert by_doc[1] == {0: "a b c"}
    assert 2 not in by_doc


def test_chunking_is_map_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = chunk_docs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_packing_empty_input(spark, sf_dir):
    empty = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(0)
    assert pack_sequences(empty).count() == 0
    assert chunk_docs(empty).count() == 0
