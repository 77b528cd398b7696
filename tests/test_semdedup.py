"""SemDeDup (cluster-then-prune semantic dedup) vs a numpy replica.

The operator's contract: Voronoi-assign every embedding to its argmax-
dot anchor cell (higher cid wins ties), then flag a document as a
duplicate iff some SMALLER-id document in the same cell has cosine >=
min_cos. Keep-lowest-id makes the survivor set deterministic — the
property the DuckDB oracle hashes. Here the whole rule is re-derived
with dense numpy linear algebra and compared row-for-row.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from log_formatter_spark.operators import dedup

MIN_COS = 0.3
K = 8


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def replica(emb):
    rows = sorted(
        ((r["vec_id"], list(r["embedding"])) for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    V = np.array([t[1] for t in rows], dtype=np.float64)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    cents = V[:K]  # anchor centroids = lowest-id unit vectors
    dots = V @ cents.T
    # argmax with higher-cid tie break: reversed argmax over flipped cols
    cell = (K - 1) - np.argmax(dots[:, ::-1], axis=1)
    out = {}
    for j in range(len(ids)):
        same = (cell == cell[j]) & (ids < ids[j])
        prior = float((V[same] @ V[j]).max()) if same.any() else -2.0
        out[int(ids[j])] = (int(cell[j]), prior)
    return out


def test_semdedup_matches_numpy_replica(emb, replica):
    got = {
        r["vec_id"]: (r["cell"], r["max_prior_cos"], r["is_dup"])
        for r in dedup.semdedup(emb, n_clusters=K, min_cos=MIN_COS).collect()
    }
    assert set(got) == set(replica)
    for vid, (cell, prior) in replica.items():
        g_cell, g_prior, g_dup = got[vid]
        assert g_cell == cell, vid
        assert g_prior == pytest.approx(prior, abs=1e-9), vid
        assert g_dup == (prior >= MIN_COS), vid


def test_semdedup_keeps_cluster_minimum(emb):
    out = dedup.semdedup(emb, n_clusters=K, min_cos=MIN_COS)
    mins = out.groupBy("cell").agg(F.min("vec_id").alias("m"))
    kept_min = out.join(mins, (out.cell == mins.cell) & (out.vec_id == mins.m))
    assert kept_min.where(F.col("is_dup")).count() == 0
    # and some duplicates exist at this threshold (the flag is exercised)
    assert out.where(F.col("is_dup")).count() > 0
    assert out.count() == emb.count()


def test_semdedup_grouped_verify_equals_fold(emb):
    fold = {
        r["vec_id"]: (r["cell"], r["max_prior_cos"], r["is_dup"])
        for r in dedup.semdedup(emb, n_clusters=K, min_cos=MIN_COS).collect()
    }
    grouped = {
        r["vec_id"]: (r["cell"], r["max_prior_cos"], r["is_dup"])
        for r in dedup.semdedup(
            emb, n_clusters=K, min_cos=MIN_COS, verify="grouped"
        ).collect()
    }
    assert set(fold) == set(grouped)
    for vid, (cell, prior, dup) in fold.items():
        g_cell, g_prior, g_dup = grouped[vid]
        assert g_cell == cell
        assert g_prior == pytest.approx(prior, abs=1e-9)
        assert g_dup == dup


def test_semdedup_trained_and_auto_knobs(emb):
    out = dedup.semdedup(emb, n_clusters=None, min_cos=MIN_COS, centroids="trained")
    assert out.count() == emb.count()
    assert out.columns == ["vec_id", "cell", "max_prior_cos", "is_dup"]


def test_semdedup_plan_has_no_cross_product(emb):
    plan = (
        dedup.semdedup(emb, n_clusters=K, min_cos=MIN_COS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semdedup_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = dedup.semdedup(empty, n_clusters=K, min_cos=MIN_COS)
    assert out.count() == 0
    assert out.columns == ["vec_id", "cell", "max_prior_cos", "is_dup"]
