"""Blocked near-dup plans vs their all-pairs baselines.

The 100 TB near-dup paths must never form an O(n²) cross product, and
where the blocking is exact (pigeonhole SimHash segments) the blocked
result must equal the all-pairs result row-for-row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_simhash_blocked_equals_all_pairs(spark, docs):
    for max_h in (2, 4, 8):
        blocked = dedup.simhash_pairs_blocked(docs, max_hamming=max_h)
        exact = dedup.simhash_pairs(docs, max_hamming=max_h)
        assert _rows(blocked) == _rows(exact), f"max_hamming={max_h}"


def test_simhash_blocked_plan_has_no_cross_product(spark, docs):
    plan = (
        dedup.simhash_pairs_blocked(docs, max_hamming=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_segment_bounds_cover_all_bits():
    for total, nb in ((60, 5), (60, 3), (64, 7)):
        bounds = dedup._segment_bounds(total, nb)
        assert sum(w for _, w in bounds) == total
        assert bounds[0][0] == 0
        for (s0, w0), (s1, _) in zip(bounds, bounds[1:]):
            assert s1 == s0 + w0
