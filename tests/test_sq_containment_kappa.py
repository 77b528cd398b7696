"""Round-5 session-6 operators: SQ8 scalar quantization, asymmetric
containment, and the rater-agreement kappa audit.

Oracle parity for all five catalog entries is covered by the
parameterized test_contract replica; these tests pin the SEMANTIC
properties the hash can't see (reconstruction bounds, recall floor,
doc-in-doc detection vs Jaccard, kappa algebra / NULL rules)."""

from __future__ import annotations

import math

from pyspark.sql import Row

from log_formatter_spark.operators.corpus import rater_agreement
from log_formatter_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs
from log_formatter_spark.operators.similarity import (
    ann_recall,
    sq_codes,
    sq_scales,
    sq_topk,
)

# --- scalar quantization ----------------------------------------------------


def test_sq_codes_bounds_and_reconstruction(spark, sf_dir):
    """Codes live in [-127, 127]; dequantized reconstruction is within
    one quantization step (s_j/127) of the unit vector per dimension."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scales = sq_scales(emb)
    assert scales and all(s >= 0.0 for s in scales)
    codes = {r["vec_id"]: r["codes"] for r in sq_codes(emb).collect()}
    from log_formatter_spark.functions.vectors import with_unit

    uvs = {
        r["vec_id"]: r["uv"]
        for r in with_unit(emb, "vec_id", "embedding").select("vec_id", "uv").collect()
    }
    assert set(codes) == set(uvs)
    for vid, cs in codes.items():
        assert len(cs) == len(scales)
        for j, c in enumerate(cs):
            assert -127 <= c <= 127
            s = scales[j]
            if s == 0.0:
                assert c == 0
            else:
                # floor quantization: recon in (x - step, x + step)
                assert abs(c / 127.0 * s - uvs[vid][j]) <= s / 127.0 + 1e-12


def test_sq_topk_recall_floor(spark, sf_dir):
    """SQ8 keeps nearly all exact neighbors — 8x compression should not
    behave like an aggressive ANN; mean recall@10 must clear 0.9 on the
    driver embeddings (PQ's demo config sits far lower)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = ann_recall(emb, method="sq", k=10).collect()
    assert rows
    mean_recall = sum(r["recall"] for r in rows) / len(rows)
    assert mean_recall >= 0.9, mean_recall


def test_sq_empty_corpus(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    assert sq_codes(emb).collect() == []
    assert sq_topk(emb).collect() == []
    assert sq_codes(emb).columns == ["vec_id", "codes"]
    assert sq_topk(emb).columns == ["q_id", "neighbor_id", "rank", "approx_cos"]


def test_sq_rank_shape(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = sq_topk(emb, k=5, n_queries=4).collect()
    by_q: dict[int, list[int]] = {}
    for r in rows:
        assert r["q_id"] != r["neighbor_id"]
        by_q.setdefault(r["q_id"], []).append(r["rank"])
    assert set(by_q) == {0, 1, 2, 3}
    for ranks in by_q.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


# --- containment ------------------------------------------------------------


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t)) for i, t in enumerate(texts)]
    )


def test_containment_finds_doc_in_doc_jaccard_misses(spark):
    """A short quote embedded verbatim in a long page: containment 1.0,
    Jaccard far below any dedup threshold."""
    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(80))
    page = filler + " " + quote + " " + filler.replace("w", "z")
    df = _docs_df(spark, [quote, page])
    got = containment_pairs(df, n=3, min_containment=0.5).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"], r["direction"]) == (0, 1, "a_in_b")
    assert r["containment"] == 1.0
    assert r["na"] < r["nb"]
    jac = ngram_jaccard_pairs(df, n=3, min_jaccard=0.0).collect()
    assert jac and jac[0]["jaccard"] < 0.1  # symmetric similarity misses it


def test_containment_direction_and_threshold(spark):
    """Half-overlap sits exactly at the threshold; disjoint docs never
    form a pair (blocking: no shared shingle, no candidate)."""
    a = "a b c d e f"          # shingles: 4
    b = "c d e f g h i j"      # shares 'c d e', 'd e f' with a
    c = "p q r s t u"          # disjoint
    rows = containment_pairs(_docs_df(spark, [a, b, c]), n=3, min_containment=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["containment"] == 0.5  # 2 shared / min(4, 6)
    assert r["direction"] == "a_in_b"


def test_containment_hot_shingle_guard(spark):
    """max_doc_freq drops ubiquitous shingles BEFORE the self-join: with
    the boilerplate shingle excluded, the pair loses its only shared
    shingle and disappears."""
    boiler = "click here to subscribe"
    texts = [f"{boiler} unique{i} only{i} text{i}" for i in range(4)]
    df = _docs_df(spark, texts)
    unguarded = containment_pairs(df, n=3, min_containment=0.1).collect()
    assert unguarded  # the boilerplate shingles form pairs
    guarded = containment_pairs(df, n=3, min_containment=0.1, max_doc_freq=2).collect()
    assert guarded == []


# --- rater agreement --------------------------------------------------------


def test_kappa_algebra_internal_consistency(spark, sf_dir):
    """po/pe/kappa must equal a Python recomputation from the four
    integer cells — and the fixture must exercise real disagreement."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = rater_agreement(docs).collect()
    assert rows
    saw_disagreement = False
    for r in rows:
        n11, n10, n01, n00 = (
            r["n_both_keep"], r["n_a_only"], r["n_b_only"], r["n_both_drop"],
        )
        n = r["n_docs"]
        assert n == n11 + n10 + n01 + n00
        po = (n11 + n00) / n
        pe = ((n11 + n10) / n) * ((n11 + n01) / n) + ((n01 + n00) / n) * (
            (n10 + n00) / n
        )
        assert math.isclose(r["po"], po, rel_tol=0, abs_tol=1e-12)
        assert math.isclose(r["pe"], pe, rel_tol=0, abs_tol=1e-12)
        if pe != 1.0:
            assert math.isclose(
                r["kappa"], (po - pe) / (1.0 - pe), rel_tol=0, abs_tol=1e-12
            )
        if n10 + n01:
            saw_disagreement = True
    assert saw_disagreement


def test_kappa_null_when_agreement_is_degenerate(spark):
    """Unanimous labelers: po = pe = 1 and kappa is NULL (chance
    agreement is total — kappa is undefined, not 0/0 or a crash)."""
    good = " ".join(["the quick brown fox is happy to run in the field"] * 10)
    df = _docs_df(spark, [good] * 5)
    rows = rater_agreement(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 5 and r["n_both_keep"] == 5
    assert r["po"] == 1.0 and r["pe"] == 1.0 and r["kappa"] is None


def test_kappa_excludes_zero_token_docs(spark):
    df = _docs_df(spark, ["", "   ", "the quick brown fox is here to stay ok"])
    rows = rater_agreement(df).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 1


def test_sq_topk_ivf_degenerates_to_all_scan(spark, sf_dir):
    """With every cell probed (n_probe >= n_centroids) the IVF-composed
    form must equal the all-scan result exactly — same candidates, same
    scores, same ranking."""
    from log_formatter_spark.operators.similarity import N_CENTROIDS

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    full = {tuple(r) for r in sq_topk(emb, k=5, n_queries=4).collect()}
    ivf = {
        tuple(r)
        for r in sq_topk(
            emb, k=5, n_queries=4, candidates="ivf", n_probe=N_CENTROIDS
        ).collect()
    }
    assert ivf == full


def test_sq_topk_ivf_recall_floor(spark, sf_dir):
    """The pruned form keeps most exact neighbors on the fixture."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    full = sq_topk(emb, k=10).collect()
    ivf = sq_topk(emb, k=10, candidates="ivf").collect()
    fp = {(r["q_id"], r["neighbor_id"]) for r in full}
    ip = {(r["q_id"], r["neighbor_id"]) for r in ivf}
    assert len(ip & fp) / len(fp) >= 0.5
