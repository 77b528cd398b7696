"""Bucketed-table co-located join: pre-shuffle once at write time, then
join with ZERO runtime exchanges — the partitioning strategy that
amortizes the big shuffle across every downstream join at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_formatter_spark.sinks.writer import write_bucketed
from log_formatter_spark.transcripts import transcripts_from_events


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    t = transcripts_from_events(spark, sf_dir)
    per_conv = t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))

    write_bucketed(t, "b_transcripts", ["conv_id"], n_buckets=8,
                   path=str(tmp_path / "bt"), sort_cols=["conv_id"])
    write_bucketed(per_conv, "b_conv_stats", ["conv_id"], n_buckets=8,
                   path=str(tmp_path / "bc"), sort_cols=["conv_id"])
    try:
        a = spark.table("b_transcripts")
        b = spark.table("b_conv_stats")
        # at this tiny SF the planner would broadcast (also fine, also
        # exchange-light); force the shuffle-join path to demonstrate
        # that the BUCKETED scans satisfy its distribution requirement
        joined = a.hint("merge").join(b, on="conv_id")
        joined.collect()  # finalize AQE
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # scans satisfy the distribution
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # and the result is right
        n = joined.count()
        assert n == t.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_transcripts")
        spark.sql("DROP TABLE IF EXISTS b_conv_stats")


def test_bucketed_vs_unbucketed_exchange_count(spark, sf_dir, tmp_path):
    """Same join over plain parquet needs two exchanges — the pair the
    bucketed layout eliminated."""
    t = transcripts_from_events(spark, sf_dir)
    per_conv = t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    t.write.mode("overwrite").parquet(str(tmp_path / "pt"))
    per_conv.write.mode("overwrite").parquet(str(tmp_path / "pc"))
    a = spark.read.parquet(str(tmp_path / "pt"))
    b = spark.read.parquet(str(tmp_path / "pc"))
    # AQE may broadcast the small side at this SF; force the shuffle
    # join to show the exchange structure bucketing removes
    joined = a.hint("merge").join(b, on="conv_id")
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # (AQE prints Initial+Final plans; both show the two shuffles)
    assert plan.count("Exchange hashpartitioning") >= 2
    assert "Bucketed: true" not in plan
