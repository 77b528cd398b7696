"""Semantic tests for edit-distance-verified near-dup
(dedup.edit_verified_pairs).

Pins the property that motivates the operator: shingle-set Jaccard is
blind to token ORDER, so a scrambled template collides in MinHash bands
yet is not a small-edit duplicate — the bounded Levenshtein verify must
reject it while keeping genuinely near-identical pairs with their exact
distances.
"""

from __future__ import annotations

from log_formatter_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_small_edit_kept_with_exact_distance(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, base), (2, base.replace("lazy", "hazy")), (3, "completely different payload")]
    out = dedup.edit_verified_pairs(_docs(spark, rows), max_edit=4, n=3).collect()
    assert [(r.doc_a, r.doc_b, r.edit_dist) for r in out] == [(1, 2, 1)]


def test_reordered_text_rejected_by_edit_bound(spark):
    # same 1-gram shingle set in a rotated order: Jaccard-identical at
    # n=1 (est_jaccard is high), but far in edit distance
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    a = " ".join(words)
    b = " ".join(words[4:] + words[:4])
    rows = [(1, a), (2, b)]
    strict = dedup.edit_verified_pairs(_docs(spark, rows), max_edit=5, n=1)
    assert strict.count() == 0  # candidate forms, verify rejects
    loose = dedup.edit_verified_pairs(_docs(spark, rows), max_edit=100, n=1).collect()
    assert len(loose) == 1 and loose[0].edit_dist > 5  # same candidate, kept


def test_exact_duplicate_distance_zero(spark):
    rows = [(1, "Same Text"), (2, "same text"), (3, "same text")]
    # minhash tokens and the verify normalization both lowercase -> all
    # three collide and verify at distance 0 (punctuation would differ:
    # shingle tokens keep it attached, the dedup normalization strips it)
    out = dedup.edit_verified_pairs(_docs(spark, rows), max_edit=0, n=1).collect()
    got = sorted((r.doc_a, r.doc_b, r.edit_dist) for r in out)
    assert got == [(1, 2, 0), (1, 3, 0), (2, 3, 0)]
