"""Semantic tests for multi-signal duplicate families
(dedup.dup_families).

Pin the two properties that distinguish this from dedup_clusters:
transitive fusion ACROSS signals (exact evidence + near-dup evidence
merge into one family) and quality-based canonical selection (the
survivor is the best copy, not the smallest id).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from log_formatter_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog and then the quick brown "
    "fox rests in the shade of a tall green tree for a while longer"
)


def test_signals_fuse_transitively(spark):
    # 1 exact-dups 2; 3 is a small-edit near-dup of 2; 4 is unrelated.
    # No single signal links 1 to 3 — the union graph must.
    rows = [
        (1, BASE),
        (2, BASE),
        (3, BASE.replace("lazy", "hazy")),
        (4, "completely different text about boats " * 3),
    ]
    out = dedup.dup_families(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()
    fam = {r.doc_id: r.cluster_id for r in out}
    assert fam[1] == fam[2] == fam[3]
    assert fam[4] != fam[1]
    sizes = {r.doc_id: r.family_size for r in out}
    assert sizes[1] == 3 and sizes[4] == 1


def test_canonical_is_highest_quality_not_min_id(spark):
    # doc 1 (smallest id) is a LOW-quality stub; doc 2 is the full-text
    # copy. Both are exact dups of each other? No — make 2 and 3 exact
    # dups and 1 a near-dup stub... simpler: make 1 and 2 near-identical
    # with 2 longer (higher size_term -> higher quality).
    stub = "the quick brown fox jumps over the lazy dog"
    full = stub + " " + ("and it keeps running through the field " * 10).strip()
    rows = [(1, stub + " zz"), (2, stub + " zz"), (3, stub + " zz " + full)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.dup_families(df, min_est=0.2).collect()}
    # 1 and 2 are exact dups; if 3 joined the family the canonical must
    # be the highest-quality member, and among equals the smallest id
    fam1 = out[1].cluster_id
    members = [d for d, r in out.items() if r.cluster_id == fam1]
    best = max(members, key=lambda d: (out[d].quality, -d))
    for d in members:
        assert out[d].is_canonical == (d == best)
    assert out[1].is_canonical  # 1 and 2 tie on quality -> smaller id wins
    assert not out[2].is_canonical


def test_family_sizes_conserve_and_one_canonical_each(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup.dup_families(docs, max_edit=6, edit_min_est=0.05)
    n_docs = docs.count()
    assert out.count() == n_docs
    per_fam = out.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("family_size").alias("fs"),
        F.min("family_size").alias("fs2"),
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
    )
    bad = per_fam.where(
        (F.col("n") != F.col("fs"))
        | (F.col("fs") != F.col("fs2"))
        | (F.col("n_canon") != 1)
    )
    assert bad.count() == 0
    assert out.agg(F.sum("family_size")).collect()[0][0] >= n_docs
