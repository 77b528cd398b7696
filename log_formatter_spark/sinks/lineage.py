"""Batch-mode per-partition lineage manifest.

Streaming mode gets lineage from the per-batch ledger
(streaming/ledger.py). Batch mode writes a completion manifest next to
the routed output: one row per (task partition × route) with row
counts, so an operator re-running a failed batch job can verify which
partitions completed and a downstream auditor can reconcile sink
contents against the scan — the north rule's "per-partition lineage"
for the spark-submit batch path.

``spark_partition_id()`` is evaluated in the same job that writes the
routed table (the manifest is derived from the routed DataFrame after
its repartition), so manifest counts reflect exactly the partitions
the writer produced.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_formatter_spark.operators.route import ROUTE
from log_formatter_spark.sinks.writer import write_routed

MANIFEST_DIR = "_manifest"


def partition_manifest(df: DataFrame, route_col: str = ROUTE) -> DataFrame:
    """(partition_id, route, rows) for the DataFrame as partitioned."""
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id", F.col(route_col))
        .agg(F.count(F.lit(1)).alias("rows"))
    )


def write_routed_with_manifest(
    df: DataFrame, base_dir: str, mode: str = "overwrite"
) -> None:
    """Single-pass routed fan-out + lineage manifest.

    The input is persisted so the routed write and the manifest
    aggregation share one computation of the (possibly expensive)
    upstream pipeline.
    """
    df = df.persist()
    try:
        write_routed(df, base_dir, mode=mode)
        (
            partition_manifest(df)
            .coalesce(1)
            .write.mode(mode)
            .parquet(os.path.join(base_dir, MANIFEST_DIR))
        )
    finally:
        df.unpersist()


def read_manifest(spark: SparkSession, base_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_dir, MANIFEST_DIR))


def verify_against_manifest(spark: SparkSession, base_dir: str) -> bool:
    """Reconcile sink contents against the manifest (per-route totals)."""
    from log_formatter_spark.sinks.writer import read_sink

    manifest = {
        r[ROUTE]: r["total"]
        for r in read_manifest(spark, base_dir)
        .groupBy(ROUTE)
        .agg(F.sum("rows").alias("total"))
        .collect()
    }
    actual = {
        r[ROUTE]: r["total"]
        for r in read_sink(spark, base_dir)
        .groupBy(ROUTE)
        .agg(F.count(F.lit(1)).alias("total"))
        .collect()
    }
    return manifest == actual
