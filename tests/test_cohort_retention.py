"""Semantics of olap.cohort_retention: Monday-week cohorting, one count
per user per active week, weeks_since arithmetic, and the triangle
invariant (no cohort cell exceeds its week-0 size).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.operators import olap


@pytest.fixture(scope="module")
def out(spark):
    rows = [
        # user 1: first seen Mon 2024-01-01 week; active again 2 weeks on
        (1, dt.datetime(2024, 1, 2, 10, 0)),
        (1, dt.datetime(2024, 1, 3, 11, 0)),   # same week — counts once
        (1, dt.datetime(2024, 1, 16, 9, 0)),   # week of Jan 15 (+2)
        # user 2: same cohort week, never returns
        (2, dt.datetime(2024, 1, 5, 8, 0)),
        # user 3: later cohort (week of Jan 15), returns next week
        (3, dt.datetime(2024, 1, 17, 8, 0)),
        (3, dt.datetime(2024, 1, 22, 8, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    return {
        (r["cohort_week"].date(), r["weeks_since"]): r["n_users"]
        for r in olap.cohort_retention(df).collect()
    }


def test_triangle_cells(out):
    w0 = dt.date(2024, 1, 1)
    w2 = dt.date(2024, 1, 15)
    assert out[(w0, 0)] == 2          # users 1 and 2
    assert out[(w0, 2)] == 1          # user 1 returns two weeks on
    assert (w0, 1) not in out         # nobody active in week +1
    assert out[(w2, 0)] == 1          # user 3
    assert out[(w2, 1)] == 1          # user 3 returns
    assert len(out) == 4


def test_no_cell_exceeds_cohort_size(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = olap.cohort_retention(ev).collect()
    base = {
        r["cohort_week"]: r["n_users"] for r in rows if r["weeks_since"] == 0
    }
    for r in rows:
        assert r["n_users"] <= base[r["cohort_week"]]
        assert r["weeks_since"] >= 0


def test_single_user_key_exchange(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        olap.cohort_retention(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one user-key aggregation + the cohort-sized triangle groupBy; a
    # distinct-then-window formulation costs a third exchange because
    # distinct hashes on (user, week) while the window hashes on user
    assert plan.count("Exchange hashpartitioning") == 2, plan
