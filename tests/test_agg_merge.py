"""merge_sink_aggregates: merge ≡ recompute for arbitrary splits, left
fold over repeated ingests, disjoint/overlapping key handling, and the
state-sized final exchange.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from log_formatter_spark.operators.aggregate import (
    merge_sink_aggregates,
    sink_aggregates,
)
from log_formatter_spark.pipeline import full_pipeline, parsed_enriched_routed
from log_formatter_spark.transcripts import transcripts_from_events


def _rows(df):
    return sorted(
        (
            (r["route"], r["role"], r["tool"], r["hour"], r["n"])
            for r in df.collect()
        ),
        key=repr,  # a NULL hour group must still sort (None vs datetime)
    )


def test_merge_equals_recompute_any_split(spark, sf_dir):
    """Three-way split on an arbitrary non-ts key, folded left — must
    equal the single-pass recompute row-for-row."""
    t = transcripts_from_events(spark, sf_dir)
    part = F.abs(F.hash("conv_id", "turn_idx")) % 3
    splits = [t.where(part == i) for i in range(3)]
    merged = merge_sink_aggregates(
        merge_sink_aggregates(
            full_pipeline(spark, splits[0]), full_pipeline(spark, splits[1])
        ),
        full_pipeline(spark, splits[2]),
    )
    assert _rows(merged) == _rows(full_pipeline(spark, t))


def test_overlapping_keys_sum(spark, sf_dir):
    """A delta that repeats the whole corpus doubles every count."""
    t = transcripts_from_events(spark, sf_dir)
    state = full_pipeline(spark, t)
    doubled = merge_sink_aggregates(state, full_pipeline(spark, t))
    base = {k[:4]: k[4] for k in _rows(state)}
    for *key, n in _rows(doubled):
        assert n == 2 * base[tuple(key)]


def test_delta_only_keys_survive(spark, sf_dir):
    """Keys present only in the delta appear with their own counts."""
    t = transcripts_from_events(spark, sf_dir)
    cut = F.lit("2024-01-21 00:00:00").cast("timestamp_ntz")
    state = full_pipeline(spark, t.where(F.col("ts") < cut))
    delta = full_pipeline(spark, t.where(F.col("ts") >= cut))
    merged = {k[:4]: k[4] for k in _rows(merge_sink_aggregates(state, delta))}
    state_keys = {k[:4] for k in _rows(state)}
    delta_rows = _rows(delta)
    new_keys = [k for k in delta_rows if k[:4] not in state_keys]
    assert new_keys, "cutoff split produced no delta-only hour buckets"
    for *key, n in new_keys:
        assert merged[tuple(key)] == n


def test_final_exchange_is_state_sized(spark, sf_dir):
    """The merge's re-aggregation consumes two ALREADY-AGGREGATED
    inputs: the plan's union feeds HashAggregates, and the row-scale
    side (the delta parse) partial-aggregates before its exchange —
    no raw-row shuffle to the merge."""
    t = transcripts_from_events(spark, sf_dir)
    cut = F.lit("2024-01-21 00:00:00").cast("timestamp_ntz")
    state = full_pipeline(spark, t.where(F.col("ts") < cut))
    delta = full_pipeline(spark, t.where(F.col("ts") >= cut))
    plan = (
        merge_sink_aggregates(state, delta)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Union" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # both inputs partial-aggregate below their exchanges (map-side
    # combine): every exchange in the plan sits above a HashAggregate
    # or a broadcast (enrich) — never directly above the parquet scan
    import re

    for m in re.finditer(r"Exchange hashpartitioning[^\n]*\n([^\n]*)", plan):
        nxt = m.group(1)
        assert "Scan parquet" not in nxt, "raw-row exchange in merge plan"


def test_null_ts_rows_ride_the_delta(spark, sf_dir):
    """`< cut` / `>= cut` are not complementary under NULL; the merge
    must keep NULL-ts rows (the recompute oracle keeps them under a
    NULL hour group) — the code-review finding, now pinned."""
    t = transcripts_from_events(spark, sf_dir).withColumn(
        "ts",
        F.when(F.col("turn_idx") % 17 == 3, None).otherwise(F.col("ts")),
    )
    cut = F.lit("2024-01-21 00:00:00").cast("timestamp_ntz")
    state = full_pipeline(spark, t.where(F.col("ts") < cut))
    delta = full_pipeline(
        spark, t.where((F.col("ts") >= cut) | F.col("ts").isNull())
    )
    merged = merge_sink_aggregates(state, delta)
    assert _rows(merged) == _rows(full_pipeline(spark, t))
