"""Connected-component dedup cluster resolution: transitivity and
multi-round convergence."""

from __future__ import annotations

from pyspark.sql import Row

from log_formatter_spark.operators.dedup import cluster_pairs


def test_transitive_chain_and_singletons(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(1, 8)])
    # path 1-2-3 (transitive), pair 5-6, singletons 4 and 7
    pairs = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3), Row(doc_a=5, doc_b=6)]
    )
    got = {r["doc_id"]: (r["cluster_id"], r["is_survivor"]) for r in
           cluster_pairs(docs, pairs).collect()}
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        4: (4, True), 5: (5, True), 6: (5, False), 7: (7, True),
    }


def test_long_path_needs_multiple_rounds(spark):
    """A 10-node path has diameter 9 — label propagation must iterate
    (min label crosses one hop per round) and still converge to one
    component."""
    n = 10
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    pairs = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(n - 1)]
    )
    out = cluster_pairs(docs, pairs).collect()
    assert {r["cluster_id"] for r in out} == {0}
    assert sum(r["is_survivor"] for r in out) == 1


def test_empty_pairs_all_survive(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(3)])
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = cluster_pairs(docs, pairs).collect()
    assert all(r["is_survivor"] and r["cluster_id"] == r["doc_id"] for r in out)
