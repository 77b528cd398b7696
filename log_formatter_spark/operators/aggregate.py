"""Per-sink hash aggregates (north-rule stage 4).

counts by (route, role, tool, hour-bucketed ts). Spark executes this as
partial (map-side) + final HashAggregateExec with whole-stage codegen —
the shuffle moves only (route, role, tool, hour, partial_count) tuples,
never raw rows, so at 10^12 turns the shuffle volume is bounded by the
group-key cardinality × partitions, not by data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from log_formatter_spark.operators.route import ROUTE


def sink_aggregates(df: DataFrame, route_col: str = ROUTE) -> DataFrame:
    """groupBy(route, role, tool, hour).count() — one job for all sinks.

    A single grouped aggregate over the routed batch replaces N
    per-sink aggregations: cheaper (one shuffle) and identical results
    (route is in the key).
    """
    return (
        df.groupBy(
            F.col(route_col),
            F.col("role"),
            F.col("tool"),
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_sink_aggregates(state: DataFrame, delta_agg: DataFrame) -> DataFrame:
    """Incremental maintenance of the per-sink aggregate table: merge the
    MAINTAINED state (route, role, tool, hour, n) with a freshly
    aggregated ingest batch — ``union`` of two already-aggregated frames
    re-grouped on the sink key. Because ``count`` then ``sum`` is the
    canonical commutative-monoid decomposition, the merge is provably
    equal to recomputing :func:`sink_aggregates` over the union of the
    raw rows (pinned in tests/test_agg_merge.py for arbitrary splits,
    and by the driver's full-recompute oracle).

    This is the 10^12-turn shape the north rule's aggregate sinks need:
    the corpus is never re-scanned — the state table is sink-key-sized
    (|routes|·|roles|·|tools|·hours), the only row-scale work is the
    delta batch's own parse→route→partial-agg, and the merge's final
    exchange moves state-sized tuples only. Repeated ingests fold left:
    merge(merge(state, d1), d2) == recompute(base ∪ d1 ∪ d2).
    """
    return (
        state.unionByName(delta_agg)
        .groupBy("route", "role", "tool", "hour")
        .agg(F.sum("n").alias("n"))
    )
