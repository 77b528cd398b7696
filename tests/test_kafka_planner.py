"""YAML-config-driven kafka pipeline, end to end with no broker:
kafka_fixture source (frames + shared decode) → parser over the decoded
text → dynamic-template route → parquet fan-out. This is the config
surface a reference user writes for their kafka input
(reference config.modules/input-kafka*.yml), executing in-sandbox."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_formatter_spark.plans.planner import run_batch
from log_formatter_spark.transcripts import TRANSCRIPT_PATTERN


def test_yaml_kafka_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "routed")
    cfg = {
        "input": {
            "target": "kafka_fixture",
            "sf_dir": sf_dir,
            "schema": "json",
            "corrupt_every": 20,
        },
        "pipeline": {
            "formatters": [
                {"parser": {"components_regex": TRANSCRIPT_PATTERN}},
                {"route": {"template": "logs-{{level}}-{{role}}"}},
            ],
            "labels": {"env": "test"},
        },
        "output": {"target": "parquet", "path": out, "index": "logs-{{level}}"},
    }
    df = run_batch(spark, cfg)

    # corrupted frames carry null text -> parse failure, not a crash
    n_total = df.count()
    n_bad = df.where(~F.col("decode_ok")).count()
    assert n_total == 1000 and n_bad > 0
    assert df.where(~F.col("decode_ok") & F.col("parse_ok")).count() == 0

    # fan-out landed partitioned by the dynamic route
    back = spark.read.parquet(out)
    routes = {r["route"] for r in back.select("route").distinct().collect()}
    assert any(r.startswith("logs-") for r in routes)
    assert back.count() == n_total
    assert {r["env"] for r in back.select("env").distinct().collect()} == {"test"}
