"""Randomized spec tests for prefix_share and cluster_split against
brute-force pure-Python oracles (independent of the DuckDB renderings
already checked in tests/test_contract.py)."""

from __future__ import annotations

import random

from pyspark.sql import Row

from log_formatter_spark.operators.corpus import cluster_split
from log_formatter_spark.operators.dedup import cluster_pairs
from log_formatter_spark.transcripts import prefix_share


def _random_transcripts(rng: random.Random, n_convs: int = 40):
    """Tiny per-turn vocab so prefixes genuinely collide; occasional
    NULL text to exercise the sentinel path."""
    rows = []
    for c in range(n_convs):
        n = rng.randrange(1, 8)
        for i in range(n):
            if rng.random() < 0.05:
                text = None
            else:
                text = rng.choice(["hi", "ok", "go", "no"])
            rows.append(Row(conv_id=f"c{c:03d}", turn_idx=i, text=text))
    return rows


def test_prefix_share_matches_bruteforce(spark):
    rng = random.Random(20260820)
    rows = _random_transcripts(rng)
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {
        r["conv_id"]: (r["n_turns"], r["shared_depth"], r["shared_ppm"])
        for r in prefix_share(df).collect()
    }

    # brute force: prefix tuples of raw text values (None is a value)
    convs: dict[str, list] = {}
    for r in rows:
        convs.setdefault(r.conv_id, []).append((r.turn_idx, r.text))
    seqs = {c: tuple(t for _, t in sorted(v)) for c, v in convs.items()}
    want = {}
    for c, seq in seqs.items():
        depth = 0
        for k in range(1, len(seq) + 1):
            if any(o != c and seqs[o][:k] == seq[:k] for o in seqs):
                depth = k
        want[c] = (len(seq), depth, depth * 1000000 // len(seq))
    assert got == want


def _random_pairs(rng: random.Random, n_docs: int, n_edges: int):
    pairs = set()
    while len(pairs) < n_edges:
        a, b = rng.randrange(n_docs), rng.randrange(n_docs)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    return sorted(pairs)


def test_cluster_split_matches_bruteforce_components(spark):
    """cluster_id = min doc id of the brute-force connected component;
    split identical for every member; singletons keep the per-doc
    assignment (checked via cluster_id == doc_id)."""
    rng = random.Random(20260820)
    n = 60
    edges = _random_pairs(rng, n, 35)
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    pairs = spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in edges]
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["bucket"], r["split"])
        for r in cluster_split(docs, pairs).collect()
    }

    # brute-force CC (union-find)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict[int, list[int]] = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    for members in comp.values():
        cid = min(members)
        assigns = {got[m] for m in members}
        assert len(assigns) == 1, members
        assert got[members[0]][0] == cid, members


def test_cluster_split_leakage_free_on_random_graph(spark):
    """No edge may straddle splits, for any random pair graph."""
    rng = random.Random(7)
    n = 80
    edges = _random_pairs(rng, n, 50)
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    pairs = spark.createDataFrame([Row(doc_a=a, doc_b=b) for a, b in edges])
    split = {r["doc_id"]: r["split"] for r in cluster_split(docs, pairs).collect()}
    for a, b in edges:
        assert split[a] == split[b], (a, b)


def test_cluster_pairs_random_graph_equivalence(spark):
    """minlabel/auto and star must agree on arbitrary random graphs
    (different algorithms, one answer)."""
    rng = random.Random(99)
    n = 50
    edges = _random_pairs(rng, n, 30)
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
    pairs = spark.createDataFrame([Row(doc_a=a, doc_b=b) for a, b in edges])
    auto = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_pairs(docs, pairs, algorithm="auto").collect()
    }
    star = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_pairs(docs, pairs, algorithm="star").collect()
    }
    assert auto == star
