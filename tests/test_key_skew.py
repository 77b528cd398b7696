"""skew.key_skew_report: exact shares, ceil salt recommendation,
deterministic rank-k ties, equality with plain counts, and the
skew-proof plan (no BroadcastNestedLoopJoin from the totals attach).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from log_formatter_spark.operators import skew
from log_formatter_spark.transcripts import transcripts_from_events

_TS = dt.datetime(2024, 1, 1)


def _t(spark, conv_turns):
    rows = []
    for conv, n in conv_turns.items():
        rows += [(conv, i, "user", "x", "bash", _TS) for i in range(n)]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )


def test_shares_and_salt(spark):
    # 100 rows total over 4 keys; hot key owns 70
    t = _t(spark, {"hot": 70, "a": 10, "b": 10, "c": 10})
    out = {r["conv_id"]: r for r in skew.key_skew_report(t, k=4).collect()}
    assert out["hot"]["n_rows"] == 70
    assert out["hot"]["total_rows"] == 100
    assert out["hot"]["n_keys"] == 4
    assert out["hot"]["share_ppm"] == 700000
    # 70 rows / (100/4 = 25 avg) -> ceil(2.8) = 3 salts
    assert out["hot"]["salt_n"] == 3
    assert out["a"]["share_ppm"] == 100000
    assert out["a"]["salt_n"] == 1  # ceil(0.4) = 1


def test_topk_cuts_and_ties_break_on_key(spark):
    t = _t(spark, {"z": 5, "y": 5, "x": 5, "w": 9})
    rows = skew.key_skew_report(t, k=2).collect()
    got = [(r["conv_id"], r["n_rows"]) for r in rows]
    assert sorted(got) == [("w", 9), ("x", 5)]  # tie 5/5/5 -> lowest key


def test_matches_plain_counts_on_driver_view(spark, sf_dir):
    t = transcripts_from_events(spark, sf_dir)
    rep = skew.key_skew_report(t).collect()
    assert rep
    plain = {
        r["conv_id"]: r["n"]
        for r in t.groupBy("conv_id").count().withColumnRenamed("count", "n").collect()
    }
    total = sum(plain.values())
    for r in rep:
        assert r["n_rows"] == plain[r["conv_id"]]
        assert r["total_rows"] == total
        assert r["n_keys"] == len(plain)
        assert r["share_ppm"] == r["n_rows"] * 1_000_000 // total
        assert (
            r["salt_n"]
            == (r["n_rows"] * len(plain) + total - 1) // total
        )


def test_null_key_group_survives(spark):
    # A genuine NULL-key group is the archetypal hot key (every
    # anonymous/dropped id collapses onto it) — the totals marker row
    # must not take it down with it (ADVICE r4: marker was NULL-keyed).
    t = _t(spark, {"a": 5, "b": 5}).withColumn(
        "conv_id",
        F.when(F.col("turn_idx") < 3, None).otherwise(F.col("conv_id")),
    )
    rows = skew.key_skew_report(t, k=3).collect()
    by_key = {r["conv_id"]: r for r in rows}
    assert None in by_key  # 6 NULL rows = the hottest key
    assert by_key[None]["n_rows"] == 6
    assert by_key[None]["total_rows"] == 10
    assert by_key[None]["n_keys"] == 3


def test_totals_attach_without_bnlj(spark, sf_dir):
    plan = (
        skew.key_skew_report(transcripts_from_events(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort
