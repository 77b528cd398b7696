"""Catalog-wide plan hygiene: every driver-contract query's physical
plan is screened for scale-killer nodes. Individual plan-shape tests
live in test_plans.py; this sweep guarantees no FUTURE contract entry
quietly ships an all-pairs product or row-at-a-time Python.
"""

from __future__ import annotations

import pytest

from log_formatter_spark import contract

# Exact baselines that are MEANT to be quadratic/non-equi on small
# blocks (their bucketed scale paths are separate catalog entries):
#   dedup_embedding  — all-pairs exact near-dup (anchor for the LSH path)
#   similarity_topk  — broadcast non-equi join, query side tiny by design
#   hybrid_rrf       — embeds similarity_topk's exact dense list as the
#                      oracle anchor (production depth swaps in lsh/ivf)
#   ann_recall_*     — recall measurement harness: compares the ANN list
#                      against the exact baseline by definition
#   pq_topk          — ADC scan: every candidate is scored (that is the
#                      point — m table lookups each, no float vectors),
#                      so the tiny broadcast query side joins non-equi;
#                      cell-pruned variants compose with ivf/lsh buckets
CROSS_PRODUCT_OK = {
    "dedup_embedding", "similarity_topk", "hybrid_rrf",
    "ann_recall_ivf", "ann_recall_lsh", "ann_recall_pq", "pq_topk",
    #   sq_topk          — same shape as pq_topk: the broadcast non-equi
    #                      join IS the compressed scan (tiny query side,
    #                      corpus side reads int8 codes only)
    "ann_recall_sq", "sq_topk",
    #   ann_ndcg_ivf     — same measurement-harness shape as ann_recall:
    #                      the exact baseline side is the documented
    #                      broadcast non-equi scan
    "ann_ndcg_ivf",
}

# streaming_pipeline_counts executes a full streaming job on call, and
# its result is a read of materialized output — no single plan to audit
SKIP = {"streaming_pipeline_counts"}

NAMES = sorted(set(contract.queries()) - SKIP)


@pytest.mark.parametrize("name", NAMES)
def test_no_scale_killer_nodes(spark, sf_dir, name):
    df = contract.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in CROSS_PRODUCT_OK:
        assert "CartesianProduct" not in plan, f"{name}: cross product"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join"
    # Nullable computed INNER-join keys make Catalyst push an
    # isnotnull(key) filter below the projection, re-inlining the whole
    # (interpreted, HOF) expression per row — the similarity_ivf 3.7×
    # regression (BENCH.md §8). Flag any filter that re-evaluates a
    # higher-order function.
    for line in plan.splitlines():
        s = line.strip()
        if s.startswith(("Filter", "+- Filter", ":- Filter")) and "isnotnull" in s:
            assert not any(h in s for h in ("aggregate(", "zip_with(", "transform(")), (
                f"{name}: isnotnull pushdown re-evaluates a HOF expression: {s[:200]}"
            )
