"""weighted_sample (token-mass PPS Poisson sampling) and dataset_diff
(snapshot delta): exact integer-threshold behavior, inclusion-rate
statistics, incremental stability, delta classification on engineered
snapshots, and the narrow-projection join shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_formatter_spark.operators.corpus import (
    WS_CAP,
    WS_RATE,
    dataset_diff,
    diff_fixture,
    weighted_sample,
)

_DOC_SCHEMA = "doc_id bigint, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, _DOC_SCHEMA)


# --- weighted_sample --------------------------------------------------------


def test_weighted_sample_zero_token_doc_never_drawn(spark):
    rows = [(1, ""), (2, "   "), (3, "one two three")]
    out = weighted_sample(_docs(spark, rows)).collect()
    assert all(r["doc_id"] == 3 or False for r in out) or out == []
    assert {r["doc_id"] for r in out} <= {3}


def test_weighted_sample_rate_tracks_token_mass(spark):
    # 2000 docs with w tokens each, w cycling 1..400: the realized
    # sample size must sit within 5 sigma of the Poisson expectation
    # sum(rate * min(w, cap)/cap).
    rows = [(i, " ".join(["t"] * (1 + i % 400))) for i in range(2000)]
    docs = _docs(spark, rows)
    out = weighted_sample(docs).count()
    exp = sum(WS_RATE * min(1 + i % 400, WS_CAP) / WS_CAP for i in range(2000))
    import math

    sigma = math.sqrt(exp)  # Poisson-binomial upper bound
    assert abs(out - exp) < 5 * sigma, (out, exp)


def test_weighted_sample_cap_saturates(spark):
    # a doc at the cap and one 10x over it have the SAME threshold:
    # inclusion must depend only on the coin, and w_capped == WS_CAP.
    rows = [(1, " ".join(["t"] * WS_CAP)), (2, " ".join(["t"] * (WS_CAP * 10)))]
    out = {r["doc_id"]: r for r in weighted_sample(_docs(spark, rows)).collect()}
    for r in out.values():
        assert r["w_capped"] == WS_CAP


def test_weighted_sample_incremental_stability(spark):
    # a doc's keep/drop never changes when other docs arrive
    rows = [(i, " ".join(["w"] * 100)) for i in range(500)]
    small = {r["doc_id"] for r in weighted_sample(_docs(spark, rows[:250])).collect()}
    big = {r["doc_id"] for r in weighted_sample(_docs(spark, rows)).collect()}
    assert small == {d for d in big if d < 250}


def test_weighted_sample_plan_is_map_only(spark):
    plan = weighted_sample(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# --- dataset_diff -----------------------------------------------------------


def test_dataset_diff_classifies_all_three(spark):
    old = _docs(spark, [(1, "a"), (2, "b"), (3, "c")])
    new = _docs(spark, [(2, "b"), (3, "c CHANGED"), (4, "d")])
    out = {r["doc_id"]: r for r in dataset_diff(old, new).collect()}
    assert set(out) == {1, 3, 4}
    assert out[1]["status"] == "removed" and out[1]["new_md5"] is None
    assert out[3]["status"] == "changed"
    assert out[3]["old_md5"] is not None and out[3]["new_md5"] is not None
    assert out[4]["status"] == "added" and out[4]["old_md5"] is None


def test_dataset_diff_unchanged_rows_emit_nothing(spark):
    old = _docs(spark, [(1, "same"), (2, "same2")])
    assert dataset_diff(old, old).count() == 0


def test_diff_fixture_produces_every_status(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old, new = diff_fixture(docs)
    got = {
        r["status"]: r["cnt"]
        for r in dataset_diff(old, new)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert set(got) == {"added", "removed", "changed"}, got


def test_dataset_diff_join_moves_hashes_not_text(spark):
    """The full-outer join's inputs must be the narrow (id, md5)
    projections — text is reduced map-side and never shuffled."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old, new = diff_fixture(docs)
    plan = dataset_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan or "full_outer" in plan.lower(), plan
    import re

    # every exchange feeding the join carries only the 2-col projection
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)
    assert plan.count("md5") >= 2
