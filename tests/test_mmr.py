"""mmr_select (maximal-marginal-relevance diverse top-k): greedy
semantics, diversity vs plain similarity top-k, fold-dot bit parity,
degenerate inputs, and the TakeOrderedAndProject pool plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_formatter_spark.operators.retrieval import MMR_K, _fold_dot, mmr_select

_EMB_SCHEMA = "vec_id bigint, embedding array<float>"


def _emb(spark, rows):
    return spark.createDataFrame(rows, _EMB_SCHEMA)


def test_mmr_prefers_diverse_over_redundant(spark):
    # query q at angle 0; clones at +1°/+2°/+3° and one candidate at
    # -60°: plain top-3 takes the clones, but after picking the +1°
    # clone MMR's marginal score makes every other clone NEGATIVE
    # (cos2°−cos1° < 0) while the diverse pick is POSITIVE
    # (cos60°−cos61° > 0) — so diversity must win the second slot.
    import math

    def at(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    rows = [(0, at(0)), (1, at(1)), (2, at(2)), (3, at(3)), (4, at(-60))]
    out = sorted(
        (r["sel_rank"], r["vec_id"])
        for r in mmr_select(_emb(spark, rows), k=3).collect()
    )
    assert out[0][1] == 1  # most relevant first
    assert out[1][1] == 4  # diversity wins the second slot
    assert len(out) == 3


def test_mmr_first_pick_is_plain_argmax_and_scores_decrease(spark):
    rows = [(i, [float(i % 7 + 1), float((i * 3) % 5 + 1)]) for i in range(30)]
    got = {r["sel_rank"]: r for r in mmr_select(_emb(spark, rows), k=5).collect()}
    assert got[1]["mmr_score"] == got[1]["relevance"]
    scores = [got[i]["mmr_score"] for i in sorted(got)]
    assert all(a >= b for a, b in zip(scores, scores[1:])), scores


def test_mmr_pool_smaller_than_k_returns_all(spark):
    rows = [(i, [1.0, float(i)]) for i in range(4)]  # query + 3 candidates
    out = mmr_select(_emb(spark, rows), k=MMR_K).collect()
    assert len(out) == 3
    assert sorted(r["sel_rank"] for r in out) == [1, 2, 3]


def test_mmr_empty_and_zero_norm_inputs(spark):
    assert mmr_select(_emb(spark, [])).count() == 0
    only_zero = _emb(spark, [(1, [0.0, 0.0]), (2, [0.0, 0.0])])
    assert mmr_select(only_zero).count() == 0
    # zero-norm rows are excluded, not selected
    mixed = _emb(spark, [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.5, 0.5])])
    ids = {r["vec_id"] for r in mmr_select(mixed).collect()}
    assert 1 not in ids and 2 in ids


def test_fold_dot_matches_spark_fold(spark):
    """_fold_dot must be bit-identical to the aggregate(zip_with) fold
    the relevance column uses — the driver-side greedy depends on it."""
    from log_formatter_spark.functions.vectors import dot

    a = [0.1234567, -0.7654321, 3.14159265, -2.71828182, 0.5772156]
    b = [1.6180339, -0.3678794, 0.6931471, 2.30258509, -1.4142135]
    got = (
        spark.range(1)
        .select(
            dot(
                F.array(*[F.lit(x) for x in a]), F.array(*[F.lit(y) for y in b])
            ).alias("d")
        )
        .collect()[0]["d"]
    )
    assert got == _fold_dot(a, b)


def test_mmr_pool_plan_is_take_ordered(spark):
    """The distributed tier must be a TakeOrderedAndProject (per-
    partition local top-pool, no global sort of the corpus)."""
    from log_formatter_spark.functions.vectors import dot, with_unit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    u = with_unit(
        emb.where(F.exists(F.col("embedding"), lambda x: x != 0.0)),
        "vec_id",
        "embedding",
    )
    q = [0.0] * 64
    plan = (
        u.select("vec_id", dot(F.col("uv"), F.array(*[F.lit(x) for x in q])).alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(40)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_mmr_vectorized_scorer_selects_same_set(spark):
    """The production Arrow einsum pool scorer must pick the same
    documents in the same order as the oracle fold kernel (scores are
    float-tolerance-equal, selection identical on non-adversarial
    margins — the ivf verify="vectorized" discipline)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    fold = {(r["sel_rank"], r["vec_id"]) for r in mmr_select(emb).collect()}
    vec = {
        (r["sel_rank"], r["vec_id"])
        for r in mmr_select(emb, scorer="vectorized").collect()
    }
    assert fold == vec
