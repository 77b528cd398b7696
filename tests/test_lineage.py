"""Batch-mode per-partition lineage: manifest totals must reconcile
exactly with sink contents, and survive a salted repartition."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_formatter_spark.operators.skew import salted_repartition
from log_formatter_spark.pipeline import parsed_enriched_routed
from log_formatter_spark.sinks.lineage import (
    read_manifest,
    verify_against_manifest,
    write_routed_with_manifest,
)
from log_formatter_spark.transcripts import transcripts_from_events


def test_manifest_reconciles(spark, sf_dir, tmp_path):
    routed = parsed_enriched_routed(
        spark, transcripts_from_events(spark, sf_dir)
    ).drop("ts")
    routed = salted_repartition(routed, 8)
    base = str(tmp_path / "routed")
    write_routed_with_manifest(routed, base)

    assert verify_against_manifest(spark, base)
    m = read_manifest(spark, base)
    assert m.agg(F.sum("rows")).first()[0] == routed.count()
    # salted repartition actually spread rows across tasks
    assert m.select("partition_id").distinct().count() > 1
