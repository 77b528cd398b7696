"""olap.term_pmi: marginal arithmetic, N-free ranking equivalence,
min-count suppression, and lift values against a pure-Python oracle.
"""

from __future__ import annotations

from collections import Counter

from log_formatter_spark.operators import olap


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_pmi(texts, min_count):
    bi = Counter()
    for t in texts:
        toks = [w for w in t.lower().split(" ") if w]
        bi.update(zip(toks, toks[1:]))
    nx = Counter()
    ny = Counter()
    for (a, b), c in bi.items():
        nx[a] += c
        ny[b] += c
    n_all = sum(bi.values())
    return {
        (a, b): (c, nx[a], ny[b], c * n_all / (nx[a] * ny[b]))
        for (a, b), c in bi.items()
        if c >= min_count
    }


def test_lift_matches_python(spark):
    texts = [
        "strong coffee strong coffee strong coffee",
        "strong coffee strong tea weak tea",
        "weak coffee strong coffee strong coffee",
        "strong coffee strong coffee weak tea",
    ]
    expect = _py_pmi(texts, min_count=2)
    rows = olap.term_pmi(_docs(spark, texts), k=50, min_count=2).collect()
    got = {(r["w1"], r["w2"]): (r["n_xy"], r["n_x"], r["n_y"], r["lift"]) for r in rows}
    assert got == expect


def test_min_count_suppresses_hapax(spark):
    texts = ["alpha beta gamma", "alpha beta delta", "alpha beta"]
    rows = olap.term_pmi(_docs(spark, texts), k=50, min_count=3).collect()
    assert {(r["w1"], r["w2"]) for r in rows} == {("alpha", "beta")}


def test_topk_order_is_lift_order(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = olap.term_pmi(docs, k=10).collect()
    assert 0 < len(rows) <= 10
    lifts = sorted((r["lift"] for r in rows), reverse=True)
    # the k selected rows are the k largest lifts (order within the
    # result set is unspecified; the contract sorts rows anyway)
    full = olap.term_pmi(docs, k=1000).collect()
    all_lifts = sorted((r["lift"] for r in full), reverse=True)
    assert lifts == all_lifts[: len(rows)]


def test_collocation_beats_chance(spark):
    """A pair that always co-occurs has lift > 1; an anti-correlated
    pair scores below the always-together pair."""
    texts = ["new york " * 3 + "old boot new shoe old york"] * 2
    rows = olap.term_pmi(_docs(spark, texts), k=50, min_count=2).collect()
    by = {(r["w1"], r["w2"]): r["lift"] for r in rows}
    assert by[("new", "york")] > 1.0
    assert by[("new", "york")] > by.get(("old", "york"), 0.0)
