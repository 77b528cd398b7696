"""Semantics of olap.event_funnel: strict stage ORDER (an out-of-order
click never converts), inclusive same-timestamp boundaries, users
missing an early stage fall out of everything after it, and the whole
funnel rides ONE user-key exchange.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.operators import olap


def _ts(m):
    return dt.datetime(2024, 1, 1, 12, m, 0)


@pytest.fixture(scope="module")
def out(spark):
    rows = [
        # user 1: perfect in-order funnel
        (1, _ts(0), "signup"), (1, _ts(1), "view"),
        (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # user 2: click BEFORE the first view — stalls at view
        (2, _ts(0), "signup"), (2, _ts(1), "click"), (2, _ts(2), "view"),
        # user 3: no signup at all — counts only in all_users
        (3, _ts(0), "view"), (3, _ts(1), "click"), (3, _ts(2), "purchase"),
        # user 4: same-ts boundary — view and click at the same instant
        (4, _ts(0), "signup"), (4, _ts(1), "view"), (4, _ts(1), "click"),
        # user 5: NULL ts rows are excluded up front
        (5, None, "signup"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string"
    )
    return {r["stage"]: r["n_users"] for r in olap.event_funnel(df).collect()}


def test_stage_counts(out):
    # user 5's only event has a NULL ts, so they are not a funnel
    # subject at all — all_users counts users with >=1 orderable event
    assert out["all_users"] == 4
    assert out["signup"] == 3  # users 1, 2, 4
    assert out["view"] == 3    # users 1, 2, 4 (view after signup)
    assert out["click"] == 2   # user 1, and user 4 via the >= boundary
    assert out["purchase"] == 1


def test_counts_monotone(out):
    seq = [out[s] for s in ("signup",) + ("view", "click", "purchase")]
    for prev, cur in zip(seq, seq[1:]):
        assert cur <= prev


def test_single_user_key_exchange(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        olap.event_funnel(ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
