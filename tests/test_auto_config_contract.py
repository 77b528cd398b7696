"""The auto-sized-config contract rows (VERDICT r4 "what's wrong" #1):
the *_auto queries grade the GROWN bucket-code / cluster-count config
class the operators actually ship with, on a deterministically
10×-expanded corpus. These tests pin the invariants the static SQL
oracles rely on, so testdata drift or a formula change fails loudly
instead of silently grading a stale config.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from log_formatter_spark import contract
from log_formatter_spark.operators import dedup
from log_formatter_spark.operators.similarity import auto_bits, auto_centroids


def test_pinned_corpus_size_matches_testdata(spark, sf_dir):
    # the oracle SQL embeds auto_bits(AUTO_EXP_N) as a static knob, so
    # AUTO_EXP_N must equal what the operator's count() actually sees
    base = contract._emb(spark, sf_dir).count()
    assert base == contract.SF001_EMB_N
    exp = contract._emb_expanded(spark, sf_dir)
    assert exp.count() == contract.AUTO_EXP_N
    assert exp.select("vec_id").distinct().count() == contract.AUTO_EXP_N


def test_auto_config_is_grown_not_clamped(spark, sf_dir):
    # the whole point: at the expanded size the auto formulas leave
    # their clamp floors (bits 3 -> 7, clusters 8 -> 71), so the graded
    # config is the grown class, not the pinned legacy knobs
    bits = auto_bits(contract.AUTO_EXP_N, dedup.EMBED_LSH_TARGET_BUCKET)
    k = auto_centroids(contract.AUTO_EXP_N)
    assert bits > dedup.EMBED_LSH_BITS
    assert k > 8
    # and the base corpus clamps — which is WHY the expansion exists
    assert (
        auto_bits(contract.SF001_EMB_N, dedup.EMBED_LSH_TARGET_BUCKET)
        == dedup.EMBED_LSH_BITS
    )


def test_expansion_matches_duckdb_exactly(spark, sf_dir):
    # sign flips are exact IEEE ops: both engines must build the
    # bit-identical expanded corpus (ids AND every float element)
    import os

    import duckdb

    got = {
        r["vec_id"]: r["embedding"]
        for r in contract._emb_expanded(spark, sf_dir).collect()
    }
    p = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}')")
    want = dict(
        con.execute(
            f"WITH {contract._EXPANDED_EMB_CTE} SELECT vec_id, embedding FROM expanded"
        ).fetchall()
    )
    assert len(got) == len(want) == contract.AUTO_EXP_N
    assert got == want


def test_within_replica_pairs_equal_base(spark, sf_dir):
    # sign-flipping both vectors of a pair cancels in every product
    # term, so each replica's within-replica near-dup pairs are the
    # base corpus' pairs id-shifted — the collision-structure proof the
    # synthetic scale-up rule demands
    base_pairs = {
        (r["id_a"], r["id_b"], r["cos"])
        for r in dedup.embedding_dup_pairs_lsh(
            contract._emb(spark, sf_dir),
            min_cos=contract.EMBED_MIN_COS,
            n_bits=dedup.EMBED_LSH_BITS,
        ).collect()
    }
    exp = contract._emb_expanded(spark, sf_dir)
    r2 = exp.where(
        (F.col("vec_id") >= 2 * contract.AUTO_EXP_STRIDE)
        & (F.col("vec_id") < 3 * contract.AUTO_EXP_STRIDE)
    )
    r2_pairs = {
        (
            r["id_a"] - 2 * contract.AUTO_EXP_STRIDE,
            r["id_b"] - 2 * contract.AUTO_EXP_STRIDE,
            r["cos"],
        )
        for r in dedup.embedding_dup_pairs_lsh(
            r2, min_cos=contract.EMBED_MIN_COS, n_bits=dedup.EMBED_LSH_BITS
        ).collect()
    }
    assert r2_pairs == base_pairs
    assert base_pairs  # non-trivial fixture
