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
