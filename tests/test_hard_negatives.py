"""Hard-negative mining: label rule, ivf equivalence, empty/edge cases."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from log_formatter_spark.operators.similarity import hard_negatives, ivf_topk


def test_label_rule_and_rank_shape(spark, sf_dir):
    """No self-pairs, no same-label pairs, ranks dense 1..<=k per query."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = hard_negatives(emb, k=10).collect()
    assert rows, "fixture must produce negatives"
    by_q: dict[int, list[int]] = {}
    for r in rows:
        assert r["q_id"] != r["neg_id"]
        assert labels[r["q_id"]] != r["neg_label"]
        assert r["neg_label"] == labels[r["neg_id"]]
        by_q.setdefault(r["q_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


def test_filter_excludes_same_label_near_misses(spark, sf_dir):
    """The rule must BITE on the fixture: the unfiltered ivf top-k
    contains same-label neighbors that hard_negatives drops."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    ivf_pairs = {
        (r["q_id"], r["neighbor_id"]) for r in ivf_topk(emb, k=10).collect()
    }
    same = {(q, n) for q, n in ivf_pairs if labels[q] == labels[n]}
    assert same, "fixture top-k should contain same-label near-misses"
    hn_pairs = {(r["q_id"], r["neg_id"]) for r in hard_negatives(emb, k=10).collect()}
    assert not (hn_pairs & same)


def test_all_distinct_labels_reduces_to_ivf(spark):
    """With every label unique the inequality never filters, so the
    result is exactly ivf_topk (same cells, same ranking)."""
    dim = 4
    rows = [
        Row(vec_id=i, embedding=[float((i * 7 + j * 3) % 5 - 2) for j in range(dim)], label=i)
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows)
    hn = {
        (r["q_id"], r["neg_id"], r["rank"], r["cos"])
        for r in hard_negatives(emb, k=5, n_queries=4).collect()
    }
    ivf = {
        (r["q_id"], r["neighbor_id"], r["rank"], r["cos"])
        for r in ivf_topk(emb, k=5, n_queries=4).collect()
    }
    assert hn == ivf


def test_empty_corpus_schema_stable(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(0)
    out = hard_negatives(emb, k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "q_id",
        "neg_id",
        "rank",
        "cos",
        "neg_label",
    ]


def test_vectorized_kernel_selects_same_pairs(spark, sf_dir):
    """The Arrow rerank kernel (production path) must pick the same
    (q_id, neg_id, rank) triples as the oracle fold kernel — only the
    cosine's float summation order may differ."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fold = [
        (r["q_id"], r["neg_id"], r["rank"])
        for r in hard_negatives(emb, k=10, verify="fold").collect()
    ]
    vec = [
        (r["q_id"], r["neg_id"], r["rank"])
        for r in hard_negatives(emb, k=10, verify="vectorized").collect()
    ]
    assert sorted(fold) == sorted(vec)


def test_trained_centroids_respect_label_rule(spark, sf_dir):
    """Production centroids (k-means) keep the semantics: only the cell
    boundaries move."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = hard_negatives(emb, k=5, centroids="trained").collect()
    assert rows
    for r in rows:
        assert labels[r["q_id"]] != r["neg_label"]


def test_null_labels_never_participate(spark, sf_dir):
    """NULL-label rows neither query nor supply negatives (documented
    three-valued-logic rule, identical in the DuckDB twin)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "label",
        F.when(F.col("vec_id") % 3 == 0, F.lit(None)).otherwise(F.col("label")),
    )
    rows = hard_negatives(emb, k=10).collect()
    assert rows
    for r in rows:
        assert r["q_id"] % 3 != 0
        assert r["neg_id"] % 3 != 0
        assert r["neg_label"] is not None
