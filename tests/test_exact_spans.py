"""Exact-substring span extraction (r3 VERDICT #8 — Lee et al. 2022
regime): maximal repeated token spans across docs via positional-shingle
diagonal runs. Hand-built fixtures pin the run math; the contract sweep
(tests/test_contract.py) pins the DuckDB oracle on the corpus fixture."""

from __future__ import annotations

import pytest

from log_formatter_spark.functions.shingles import exact_spans


def _spans(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return sorted(tuple(r) for r in exact_spans(df, **kw).collect())


W = "w%d"  # unique filler tokens


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_simple_shared_span(spark):
    shared = _words("s", 12)  # 12 shared tokens
    docs = [
        (1, _words("a", 5) + " " + shared + " " + _words("b", 4)),
        (2, _words("c", 3) + " " + shared + " " + _words("d", 6)),
    ]
    got = _spans(spark, docs, min_tokens=12, seed=8)
    # span starts: doc1 at token 6, doc2 at token 4; exactly 12 tokens
    assert got == [(1, 2, 6, 4, 12)]


def test_span_is_maximal_not_fragmented(spark):
    shared = _words("s", 20)
    docs = [(1, shared + " " + _words("x", 3)), (2, _words("y", 2) + " " + shared)]
    got = _spans(spark, docs, min_tokens=12, seed=8)
    assert got == [(1, 2, 1, 3, 20)], "one maximal span, not 13 sub-runs"


def test_below_min_tokens_dropped(spark):
    shared = _words("s", 11)  # 11 < min_tokens=12
    docs = [(1, shared + " " + _words("x", 8)), (2, shared + " " + _words("y", 8))]
    got = _spans(spark, docs, min_tokens=12, seed=8)
    assert got == []
    # but visible at min_tokens=11
    got11 = _spans(spark, docs, min_tokens=11, seed=8)
    assert got11 == [(1, 2, 1, 1, 11)]


def test_two_separate_spans_two_rows(spark):
    s1, s2 = _words("p", 12), _words("q", 13)
    docs = [
        (1, s1 + " " + _words("x", 5) + " " + s2),
        (2, s2 + " " + _words("y", 7) + " " + s1),
    ]
    got = _spans(spark, docs, min_tokens=12, seed=8)
    assert (1, 2, 1, 21, 12) in got  # s1: doc1 @1, doc2 @ 13+7+1=21
    assert (1, 2, 18, 1, 13) in got  # s2: doc1 @ 12+5+1=18, doc2 @1
    assert len(got) == 2


def test_three_docs_pairwise(spark):
    shared = _words("s", 15)
    docs = [(i, _words(f"u{i}_", i) + " " + shared) for i in (1, 2, 3)]
    got = _spans(spark, docs, min_tokens=12, seed=8)
    assert {(a, b) for a, b, *_ in got} == {(1, 2), (1, 3), (2, 3)}
    assert all(r[4] == 15 for r in got)


def test_max_df_guard_drops_hot_shingles(spark):
    shared = _words("s", 12)
    docs = [(i, shared) for i in range(1, 8)]  # 7 identical docs
    exact = _spans(spark, docs, min_tokens=12, seed=8)
    assert len(exact) == 21  # all pairs
    capped = _spans(spark, docs, min_tokens=12, seed=8, max_df=3)
    assert capped == []  # every shingle hotter than the cap


def test_empty_and_short_inputs(spark):
    docs = [(1, ""), (2, "a b c"), (3, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = exact_spans(df.where("text IS NOT NULL"), min_tokens=12, seed=8)
    assert out.count() == 0
    assert out.columns == ["doc_a", "doc_b", "a_start", "b_start", "span_tokens"]


def test_span_dup_stats_overlap_merge(spark):
    """Overlapping spans from different partners must merge before
    counting: doc1 shares tokens 1-14 with doc2 and 8-22 with doc3 →
    dup_tokens = 22 (the union), not 29 (the sum)."""
    from log_formatter_spark.functions.shingles import span_dup_stats

    def w(p, n, start=0):
        return " ".join(f"{p}{i}" for i in range(start, start + n))

    docs = [
        (1, w("s", 22)),
        (2, w("x", 4) + " " + w("s", 14)),
        (3, w("s", 15, start=7) + " " + w("y", 5)),
        (4, w("z", 30)),  # no shared spans
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_fraction"])
        for r in span_dup_stats(df, min_tokens=12, seed=8).collect()
    }
    assert out[1] == (22, 22, 1.0)
    assert out[2] == (18, 14, 14.0 / 18.0)
    assert out[3] == (20, 15, 0.75)
    assert out[4] == (30, 0, 0.0)


def test_span_dup_stats_duplicate_intervals_deterministic(spark):
    """Regression: one span shared with MANY partners yields duplicate
    (s, e) intervals; tied rows were ordered independently in the flag
    and cumulative-sum windows, splitting one island in two (DuckDB read
    24 where Spark read 12). Distinct-before-merge makes the order total."""
    from log_formatter_spark.functions.shingles import span_dup_stats

    shared = " ".join(f"s{i}" for i in range(12))
    docs = [(i, f"u{i}a u{i}b {shared}") for i in range(1, 31)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = span_dup_stats(df.repartition(7), min_tokens=12, seed=8).collect()
    assert all(r["dup_tokens"] == 12 for r in out), [tuple(r) for r in out[:3]]
