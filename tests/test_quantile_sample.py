"""olap.quantile_sample_error: exact side equals value_quantiles'
rank-select, sample determinism and stability under corpus growth,
error accounting, and a single shared sort in the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from log_formatter_spark.operators import olap


def _rows(spark, sf_dir, **kw):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return olap.quantile_sample_error(ev, **kw).collect()


def test_exact_side_matches_value_quantiles(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    vq = {r["event_type"]: r for r in olap.value_quantiles(ev).collect()}
    for r in _rows(spark, sf_dir, qs=(0.5, 0.9)):
        tag = {500000: "p50", 900000: "p90"}[r["q_ppm"]]
        assert r["exact_value"] == vq[r["event_type"]][tag]


def test_error_accounting(spark, sf_dir):
    for r in _rows(spark, sf_dir):
        assert 0 < r["m"] <= r["n"]
        if r["approx_value"] is None:
            continue
        assert 0 <= r["err_ppm"] <= 1_000_000
        # full sample (rate=1) would be exact; the estimate can't be
        # on the wrong side of the whole distribution
        assert r["approx_value"] is not None


def test_rate_one_is_exact(spark, sf_dir):
    """With every row sampled, the estimate IS the exact quantile and
    the rank error is the ceil-vs-ceil discretization only."""
    for r in _rows(spark, sf_dir, rate=1.0):
        assert r["m"] == r["n"]
        assert r["approx_value"] == r["exact_value"]
        # rank err: |ceil(q*n)*1e6 div n - q*1e6| < 1e6/n
        assert r["err_ppm"] * r["n"] <= 1_000_000


def test_sample_membership_stable_under_growth(spark, sf_dir):
    """The md5 coin never resamples history: the sampled event_ids on
    a half corpus are a subset of those on the full corpus."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from log_formatter_spark.functions.hashing import md5_60

    thresh = int(olap.QS_RATE * (1 << olap.QS_RATE_BITS))
    coin = (
        F.pmod(
            md5_60(F.col("event_id").cast("string")),
            F.lit(1 << olap.QS_RATE_BITS),
        )
        < F.lit(thresh)
    )
    full = {r["event_id"] for r in ev.where(coin).select("event_id").collect()}
    half = {
        r["event_id"]
        for r in ev.where(F.col("event_id") % 2 == 0)
        .where(coin)
        .select("event_id")
        .collect()
    }
    assert half <= full
    assert full


def test_one_shared_sort(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        olap.quantile_sample_error(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    ex = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    # all four windows + the final aggregate share the event_type key:
    # one row-scale exchange (the agg's partial/final pair reuses it)
    assert len(ex) <= 2, plan
    assert all("event_type" in e for e in ex)
