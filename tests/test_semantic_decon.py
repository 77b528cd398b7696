"""Semantic tests for embedding-space eval decontamination
(corpus.semantic_decontaminate).

The contract replica proves Spark≡DuckDB; these pin the operator's
guarantees against a brute-force exact baseline on the driver fixture:
the LSH-probed flag set is a SUBSET of the exact flag set (coverage is
the only approximation), reported cosines/hit-counts are exact for
every found pair set, and eval vectors never appear in the output.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.functions.vectors import dot, with_unit
from log_formatter_spark.operators import corpus

EVAL_MOD = 23
MIN_COS = 0.3


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def exact_flags(emb):
    """Brute-force train×eval cosine flags (test-only oracle)."""
    u = with_unit(emb, "vec_id", "embedding")
    tr = u.where(F.col("vec_id") % EVAL_MOD != 0).select(
        F.col("vec_id"), F.col("uv").alias("ut")
    )
    ev = u.where(F.col("vec_id") % EVAL_MOD == 0).select(
        F.col("vec_id").alias("eval_id"), F.col("uv").alias("ue")
    )
    pairs = (
        tr.crossJoin(ev)
        .select("vec_id", "eval_id", dot(F.col("ut"), F.col("ue")).alias("cos"))
        .where(F.col("cos") >= MIN_COS)
    )
    return {
        r.vec_id: (r.n, r.mx)
        for r in pairs.groupBy("vec_id")
        .agg(F.countDistinct("eval_id").alias("n"), F.max("cos").alias("mx"))
        .collect()
    }


def test_flags_are_subset_of_exact_with_exact_values(emb, exact_flags):
    got = corpus.semantic_decontaminate(
        emb, F.col("vec_id") % EVAL_MOD == 0, min_cos=MIN_COS
    ).collect()
    assert got, "fixture must produce a non-trivial flag set"
    for r in got:
        assert r.vec_id in exact_flags, f"{r.vec_id} flagged but not exact-contaminated"
        n_exact, mx_exact = exact_flags[r.vec_id]
        # hit count can undershoot (band coverage) but never overshoot,
        # and the max cosine over FOUND evals can't exceed the true max
        assert 1 <= r.n_eval_hits <= n_exact
        assert r.max_eval_cos <= mx_exact + 1e-12
        assert r.max_eval_cos >= MIN_COS


def test_recall_floor_on_fixture(emb, exact_flags):
    got = corpus.semantic_decontaminate(
        emb, F.col("vec_id") % EVAL_MOD == 0, min_cos=MIN_COS
    )
    found = {r.vec_id for r in got.collect()}
    recall = len(found & set(exact_flags)) / max(1, len(exact_flags))
    # 5 bands x auto bits at the fixture's weak cos~0.3 regime: measured
    # ~0.5+; pin a floor so banding regressions (lost bands, wrong
    # anchors) surface as a recall collapse, not silently
    assert recall >= 0.3, f"recall {recall:.2f} collapsed"


def test_eval_vectors_never_flagged(emb):
    got = corpus.semantic_decontaminate(
        emb, F.col("vec_id") % EVAL_MOD == 0, min_cos=MIN_COS
    )
    assert got.where(F.col("vec_id") % EVAL_MOD == 0).count() == 0


def test_eval_pred_over_non_id_column(emb):
    """The production call shape: the eval predicate references a column
    (here ``label``) that the unit projection DROPS — it must still
    resolve (eval_pred rides with_unit's extra= pass-through against the
    raw rows) and produce exactly the flags of the equivalent
    id-membership predicate."""
    pred = F.col("label") % 5 == 0
    got = corpus.semantic_decontaminate(emb, pred, min_cos=MIN_COS)
    eval_ids = [r.vec_id for r in emb.where(pred).select("vec_id").collect()]
    ref = corpus.semantic_decontaminate(
        emb, F.col("vec_id").isin(eval_ids), min_cos=MIN_COS
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_probe_plan_is_broadcast_one_sided(emb):
    """Pin the headline scale property (SURVEY §8): the eval side is
    BROADCAST into the probe — exactly one BroadcastHashJoin, zero
    SortMergeJoin, so the train side never shuffles before the verify."""
    got = corpus.semantic_decontaminate(
        emb, F.col("vec_id") % EVAL_MOD == 0, min_cos=MIN_COS
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan
