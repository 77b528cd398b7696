"""As-of join: specification tests against hand-computed expectations,
plus the plan-shape guarantee (one exchange, no join node — the operator
is a window, not a range join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from log_formatter_spark.operators.asof import asof_join


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _build(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(10), lv="L1"),   # matches r@5
            Row(k="a", ts=_ts(20), lv="L2"),   # matches r@20 (inclusive)
            Row(k="a", ts=_ts(3), lv="L3"),    # before all right rows -> nulls
            Row(k="b", ts=_ts(10), lv="L4"),   # other key -> r(b)@9
            Row(k="c", ts=_ts(10), lv="L5"),   # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(5), rid=1, v="r5"),
            Row(k="a", ts=_ts(20), rid=2, v=None),   # null value col still matches
            Row(k="a", ts=_ts(20), rid=3, v="r20b"), # dup ts: max tiebreak wins
            Row(k="b", ts=_ts(9), rid=4, v="rb"),
        ]
    )
    return left, right


def test_asof_spec(spark):
    left, right = _build(spark)
    out = asof_join(
        left, right, on="k", ts_col="ts", value_cols=["rid", "v"],
        tiebreak_col="rid", prefix="m_",
    )
    got = {r["lv"]: (r["m_ts"], r["m_rid"], r["m_v"]) for r in out.collect()}
    assert got == {
        "L1": (_ts(5), 1, "r5"),
        # inclusive <= bound; duplicate right ts -> max tiebreak (rid=3)
        "L2": (_ts(20), 3, "r20b"),
        "L3": (None, None, None),
        "L4": (_ts(9), 4, "rb"),
        "L5": (None, None, None),
    }
    # left row count and columns preserved
    assert out.count() == left.count()
    assert [c for c in out.columns[:3]] == ["k", "ts", "lv"]


def test_asof_null_value_does_not_mix_rows(spark):
    """The matched right row travels as one struct: a null member must
    surface as null, not be back-filled from an older right row."""
    left, right = _build(spark)
    out = asof_join(
        left.where("lv = 'L2'"), right.where("rid <= 2"),
        on="k", ts_col="ts", value_cols=["rid", "v"], tiebreak_col="rid", prefix="m_",
    )
    [r] = out.collect()
    assert (r["m_rid"], r["m_v"]) == (2, None)  # NOT (2, "r5")


def test_asof_plan_single_exchange_no_join(spark):
    left, right = _build(spark)
    out = asof_join(left, right, on="k", ts_col="ts", tiebreak_col="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, "as-of must be the union+window plan, not a join"
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_null_ts_right_rows_never_match(spark):
    """A right row with NULL ts is unmatchable (ASOF semantics), not
    nulls-first-sorted into being everyone's match."""
    import datetime as dt

    from pyspark.sql import Row

    left = spark.createDataFrame([Row(k="a", ts=dt.datetime(2024, 1, 1), lv="L")])
    right = spark.createDataFrame(
        [Row(k="a", ts=None, rid=1, v="ghost")],
        "k string, ts timestamp, rid int, v string",
    )
    [r] = asof_join(left, right, on="k", ts_col="ts", tiebreak_col="rid",
                    prefix="m_").collect()
    assert (r["m_ts"], r["m_rid"], r["m_v"]) == (None, None, None)


def test_asof_tiebreak_outside_value_cols(spark):
    """tiebreak_col need not be listed in value_cols (review finding:
    the window ordering referenced a missing struct field)."""
    left, right = _build(spark)
    out = asof_join(left, right, on="k", ts_col="ts", value_cols=["v"],
                    tiebreak_col="rid", prefix="m_")
    got = {r["lv"]: r["m_v"] for r in out.collect()}
    assert got["L2"] == "r20b"  # max-rid row still wins the tie


def test_asof_null_key_rows_never_match(spark):
    """SQL equality never matches NULL keys; Window.partitionBy would
    group them (ADVICE r2) — null-key right rows must be dropped so
    null-key left rows get the no-match nulls DuckDB's ASOF JOIN gives."""
    left = spark.createDataFrame(
        [Row(k=None, ts=_ts(10), lv="L1"), Row(k="a", ts=_ts(10), lv="L2")]
    )
    right = spark.createDataFrame(
        [Row(k=None, ts=_ts(5), rid=1, v="null-key"), Row(k="a", ts=_ts(5), rid=2, v="ra")]
    )
    out = {r["lv"]: r["asof_v"] for r in asof_join(left, right, on="k", tiebreak_col="rid").collect()}
    assert out == {"L1": None, "L2": "ra"}
