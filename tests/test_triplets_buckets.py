"""contrastive_triplets + length_buckets: semantics and edge cases."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from log_formatter_spark.operators.packing import length_buckets
from log_formatter_spark.operators.similarity import (
    contrastive_triplets,
    hard_negatives,
)


def test_triplets_shape_and_label_rules(spark, sf_dir):
    """Positive shares the query's label, negatives differ, no self
    pairs, neg_rank dense 1..<=m, margin = pos_cos - neg_cos."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = contrastive_triplets(emb, m=4).collect()
    assert rows, "fixture must produce triplets"
    by_q: dict[int, list[int]] = {}
    for r in rows:
        assert r["q_id"] not in (r["pos_id"], r["neg_id"])
        assert labels[r["pos_id"]] == labels[r["q_id"]]
        assert labels[r["neg_id"]] != labels[r["q_id"]]
        assert r["margin"] == r["pos_cos"] - r["neg_cos"]
        by_q.setdefault(r["q_id"], []).append(r["neg_rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
        # exactly one positive per query
        pos_ids = {r["pos_id"] for r in rows if r["q_id"] == q}
        assert len(pos_ids) == 1, q


def test_triplets_negatives_match_hard_negatives(spark, sf_dir):
    """The negative side IS hard_negatives (same cells, same ranking) —
    for every query that forms a positive."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    trip = contrastive_triplets(emb, m=4).collect()
    assert trip
    hn = {
        (r["q_id"], r["rank"]): r["neg_id"]
        for r in hard_negatives(emb, k=4).collect()
    }
    for r in trip:
        assert hn[(r["q_id"], r["neg_rank"])] == r["neg_id"]


def test_triplets_query_without_positive_drops(spark):
    """A query whose label is unique in the corpus cannot form a
    positive and emits nothing (inner semantics)."""
    dim = 4
    rows = [
        Row(
            vec_id=i,
            embedding=[float((i * 7 + j * 3) % 5 - 2) for j in range(dim)],
            label=99 if i == 1 else i % 2,
        )
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows)
    out = contrastive_triplets(emb, m=3, n_queries=4).collect()
    assert out, "other queries still form triplets"
    assert not [r for r in out if r["q_id"] == 1]


def test_triplets_null_labels_never_participate(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "label",
        F.when(F.col("vec_id") % 3 == 0, F.lit(None)).otherwise(F.col("label")),
    )
    rows = contrastive_triplets(emb, m=4).collect()
    assert rows
    for r in rows:
        assert r["q_id"] % 3 != 0
        assert r["pos_id"] % 3 != 0
        assert r["neg_id"] % 3 != 0


def test_triplets_empty_corpus_schema_stable(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(0)
    out = contrastive_triplets(emb, m=4)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "q_id",
        "pos_id",
        "neg_id",
        "neg_rank",
        "pos_cos",
        "neg_cos",
        "margin",
    ]


def test_triplets_vectorized_kernel_same_ids(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fold = [
        (r["q_id"], r["pos_id"], r["neg_id"], r["neg_rank"])
        for r in contrastive_triplets(emb, m=4, verify="fold").collect()
    ]
    vec = [
        (r["q_id"], r["pos_id"], r["neg_id"], r["neg_rank"])
        for r in contrastive_triplets(emb, m=4, verify="vectorized").collect()
    ]
    assert sorted(fold) == sorted(vec)


# --- length_buckets --------------------------------------------------------


def test_length_buckets_hand_fixture(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=""),  # 0 tokens -> tok_eff 1 -> bucket 1
            Row(doc_id=1, text="a"),  # 1 -> bucket 1
            Row(doc_id=2, text="a b"),  # 2 -> bucket 2
            Row(doc_id=3, text="a b c"),  # 3 -> bucket 4
            Row(doc_id=4, text=" ".join(["t"] * 9)),  # 9 -> bucket 16
            Row(doc_id=5, text=" ".join(["t"] * 40)),  # >max 16 -> trunc
        ]
    )
    out = {r["bucket"]: r for r in length_buckets(docs, max_bucket=16).collect()}
    assert set(out) == {1, 2, 4, 16}
    b1 = out[1]
    assert (b1["n_docs"], b1["sum_tokens"], b1["capacity"], b1["pad_tokens"]) == (
        2,
        2,
        2,
        0,
    )
    assert b1["pad_frac"] == 0.0 and b1["n_truncated"] == 0
    b4 = out[4]
    assert (b4["n_docs"], b4["sum_tokens"], b4["pad_tokens"]) == (1, 3, 1)
    assert b4["pad_frac"] == 0.25
    b16 = out[16]
    assert (b16["n_docs"], b16["sum_tokens"], b16["n_truncated"]) == (2, 25, 1)
    assert b16["pad_tokens"] == 32 - 25


def test_length_buckets_conservation(spark, sf_dir):
    """capacity = sum_tokens + pad_tokens per bucket; every doc lands in
    exactly one bucket."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = length_buckets(docs, max_bucket=256).collect()
    assert rows
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["capacity"] == r["sum_tokens"] + r["pad_tokens"]
        assert r["bucket"] & (r["bucket"] - 1) == 0
        assert 0.0 <= r["pad_frac"] < 1.0


def test_length_buckets_rejects_non_power_of_two(spark, sf_dir):
    import pytest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError):
        length_buckets(docs, max_bucket=100)
