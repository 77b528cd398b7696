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


def test_star_equals_minlabel_on_random_graphs(spark):
    """The two CC algorithms must be output-identical; seeded random
    graphs with mixed component shapes (cliques, paths, singletons)."""
    import random

    rng = random.Random(20260817)
    n = 120
    edges = []
    # random sparse edges + a deliberate 30-node path + an 8-clique
    edges += [(rng.randrange(n), rng.randrange(n)) for _ in range(60)]
    edges += [(200 + i, 200 + i + 1) for i in range(29)]
    edges += [(300 + i, 300 + j) for i in range(8) for j in range(i)]
    edges = [(a, b) for a, b in edges if a != b]
    node_ids = sorted({x for e in edges for x in e} | {999})  # +isolated
    docs = spark.createDataFrame([Row(doc_id=i) for i in node_ids])
    pairs = spark.createDataFrame([Row(doc_a=a, doc_b=b) for a, b in edges])
    star = sorted(
        (r["doc_id"], r["cluster_id"], r["is_survivor"])
        for r in cluster_pairs(docs, pairs, algorithm="star").collect()
    )
    minl = sorted(
        (r["doc_id"], r["cluster_id"], r["is_survivor"])
        for r in cluster_pairs(docs, pairs, algorithm="minlabel", max_iter=200).collect()
    )
    assert star == minl


def test_star_converges_where_minlabel_cannot(spark, recwarn):
    """A 300-node path (diameter 299): minlabel at max_iter=20 must warn
    non-convergence; star at the same max_iter must converge exactly —
    the O(log² n) vs O(diameter) round bound, observed."""
    import warnings as W

    n = 300
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    pairs = spark.createDataFrame([Row(doc_a=i, doc_b=i + 1) for i in range(n - 1)])

    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        out = cluster_pairs(docs, pairs, algorithm="star", max_iter=20).collect()
    assert not [w for w in caught if issubclass(w.category, RuntimeWarning)]
    assert {r["cluster_id"] for r in out} == {0}
    assert len(out) == n

    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        cluster_pairs(docs, pairs, algorithm="minlabel", max_iter=20).collect()
    assert [w for w in caught if issubclass(w.category, RuntimeWarning)]

    # the default auto path must escalate minlabel -> star and solve
    # the chain exactly, silently
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        out = cluster_pairs(docs, pairs, minlabel_rounds=4).collect()
    assert not [w for w in caught if issubclass(w.category, RuntimeWarning)]
    assert {r["cluster_id"] for r in out} == {0}
