"""Rank-aware ANN quality: NDCG@k vs the exact ranking."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from log_formatter_spark.operators import similarity


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_perfect_index_scores_one(spark, sf_dir):
    """method that IS the exact scan (brute == brute) must score
    ndcg = 1.0 for every query — pin via ivf with every vector in one
    probe-covered regime is fragile, so instead check the invariant on
    the output: any query whose approx list equals the exact list
    scores exactly 1.0, and all scores are in (0, 1]."""
    out = similarity.ann_ndcg(_emb(spark, sf_dir), method="ivf", k=10).collect()
    assert len(out) == 8
    for r in out:
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-12
    exact = similarity.brute_topk(_emb(spark, sf_dir), k=10)
    approx = similarity.ivf_topk(_emb(spark, sf_dir), k=10)
    same = (
        exact.select("q_id", "neighbor_id", "rank")
        .exceptAll(approx.select("q_id", "neighbor_id", "rank"))
        .select("q_id")
        .distinct()
        .collect()
    )
    differing = {r["q_id"] for r in same}
    for r in out:
        if r["q_id"] not in differing:
            assert r["ndcg"] == 1.0


def test_ndcg_formula_hand_computed(spark, sf_dir):
    """Recompute one query's NDCG from the raw rankings with plain
    Python floats in the same pinned order — must match bit-for-bit."""
    k = 10
    emb = _emb(spark, sf_dir)
    out = {r["q_id"]: r["ndcg"] for r in similarity.ann_ndcg(emb, method="lsh", k=k).collect()}
    exact = similarity.brute_topk(emb, k=k).collect()
    approx = similarity.lsh_topk(emb, k=k, n_anchors=similarity.N_ANCHORS).collect()
    gains = {(r["q_id"], r["neighbor_id"]): k - r["rank"] + 1 for r in exact}
    disc, idcg = similarity._ndcg_discounts(k)
    by_q: dict[int, dict[int, int]] = {}
    for r in approx:
        by_q.setdefault(r["q_id"], {})[r["rank"]] = gains.get(
            (r["q_id"], r["neighbor_id"]), 0
        )
    for q_id, ranks in by_q.items():
        dcg = 0.0
        for r in range(1, k + 1):
            if r in ranks:
                dcg = dcg + float(ranks[r]) * disc[r - 1]
        assert out[q_id] == dcg / idcg, q_id


def test_idcg_constant_matches_definition():
    disc, idcg = similarity._ndcg_discounts(10)
    assert disc[0] == 1.0  # 1/log2(2)
    assert math.isclose(
        idcg, sum((10 - r + 1) / math.log2(r + 1) for r in range(1, 11))
    )


def test_f64_sql_roundtrips_bit_exactly():
    """A bare decimal literal is parsed by DuckDB as DECIMAL(18,s) and
    its decimal->double conversion is off by one ULP for some values
    (measured: 0.38685280723454163). _f64_sql's dyadic-fraction
    rendering must round-trip EVERY double bit-exactly."""
    import struct

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    def rt(x: float) -> bool:
        got = con.execute(f"SELECT {similarity._f64_sql(x)}").fetchone()[0]
        return struct.pack("d", got) == struct.pack("d", x)

    # the measured offender plus the full k=10 discount/idcg set
    disc, idcg = similarity._ndcg_discounts(10)
    for v in [0.38685280723454163, idcg, *disc]:
        assert rt(v), v

    @settings(max_examples=200, deadline=None)
    @given(
        st.floats(
            min_value=1e-12, max_value=1e12, allow_nan=False, allow_infinity=False
        )
    )
    def check(x):
        assert rt(x), x

    check()


def test_ann_ndcg_on_empty_embeddings(spark, sf_dir):
    out = similarity.ann_ndcg(_emb(spark, sf_dir).limit(0), method="ivf")
    assert out.count() == 0
    assert out.columns == ["q_id", "dcg", "ndcg"]
