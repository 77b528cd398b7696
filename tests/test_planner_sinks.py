"""Planner (YAML → DAG), source/sink registries, multi-sink fan-out.

Mirrors the reference's own E2E strategy (file→forwarder→file with
line-count equality, Makefile:37-41 + test/check-same-line.sh) upgraded
to content equality, plus the dynamic {{field}} index routing
(util/config.go:16-32)."""

from __future__ import annotations

import textwrap

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.operators.route import ROUTE
from log_formatter_spark.pipeline import parsed_enriched_routed
from log_formatter_spark.plans import build_pipeline, load_config, run_batch
from log_formatter_spark.sinks import read_sink, write_routed
from log_formatter_spark.sources import build_source
from log_formatter_spark.transcripts import TRANSCRIPT_PATTERN, transcripts_from_events


def _write_cfg(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_file_to_parquet_roundtrip(spark, tmp_path):
    # the reference's file-file-test shape, content-exact
    lines = [f"2020-11-13 11:28:{i:02d} hello world" for i in range(40)]
    inp = tmp_path / "input-test.txt"
    inp.write_text("\n".join(lines) + "\n")
    cfg = load_config(
        _write_cfg(
            tmp_path,
            "file-file.yml",
            f"""
            input: {{target: file, path: "{inp}"}}
            pipeline:
              formatters: [forwarder]
            output: {{target: parquet, path: "{tmp_path}/out"}}
            """,
        )
    )
    run_batch(spark, cfg)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r["message"] for r in got.collect()) == sorted(lines)


def test_include_composition(spark, tmp_path):
    # !include fragment composition (util/config.go:38-80)
    _write_cfg(tmp_path, "input-frag.yml", "target: events_transcripts\nsf_dir: /root/testdata/sf0.001\n")
    cfg = load_config(
        _write_cfg(
            tmp_path,
            "main.yml",
            """
            input: !include input-frag.yml
            pipeline:
              worker: 4
              formatters:
                - parser: {components_regex: '%s', target_field: text}
                - enrich
                - route
              labels: {env: test}
            output: {target: noop}
            """
            % TRANSCRIPT_PATTERN,  # single-quoted YAML: backslashes stay literal
        )
    )
    df = build_pipeline(spark, cfg)
    assert "route" in df.columns and "env" in df.columns
    want = parsed_enriched_routed(
        spark, transcripts_from_events(spark, "/root/testdata/sf0.001")
    )
    got_counts = {r[ROUTE]: r["n"] for r in df.groupBy(ROUTE).agg(F.count(F.lit(1)).alias("n")).collect()}
    want_counts = {r[ROUTE]: r["n"] for r in want.groupBy(ROUTE).agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got_counts == want_counts


def test_missing_section_rejected(tmp_path):
    p = _write_cfg(tmp_path, "bad.yml", "input: {target: file}\npipeline: {}\n")
    with pytest.raises(ValueError, match="mandatory section: output"):
        load_config(p)


def test_unknown_formatter_rejected(spark, tmp_path):
    cfg = {
        "input": {"target": "events_transcripts", "sf_dir": "/root/testdata/sf0.001"},
        "pipeline": {"formatters": ["nope"]},
        "output": {"target": "noop"},
    }
    with pytest.raises(ValueError, match="unknown formatter"):
        build_pipeline(spark, cfg)


def test_single_pass_fanout_and_pruned_read(spark, sf_dir, tmp_path):
    routed = parsed_enriched_routed(spark, transcripts_from_events(spark, sf_dir))
    base = str(tmp_path / "sinks")
    write_routed(routed.drop("ts"), base)  # drop ts: partition dirs + ts types irrelevant here
    for route in ["sink_errors", "sink_tool", "sink_user", "sink_default"]:
        got = read_sink(spark, base, route).count()
        want = routed.where(F.col(ROUTE) == route).count()
        assert got == want
    # partition pruning: the per-sink read must scan only its directory
    plan = read_sink(spark, base, "sink_user")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_dynamic_index_template_sink(spark, sf_dir, tmp_path):
    # ES-style index: "logs-{{level}}" fan-out through the sink registry
    cfg = {
        "input": {"target": "events_transcripts", "sf_dir": sf_dir},
        "pipeline": {
            "formatters": [
                {"parser": {"components_regex": TRANSCRIPT_PATTERN, "target_field": "text"}},
            ]
        },
        "output": {"target": "parquet", "path": str(tmp_path / "logs"), "index": "logs-{{level}}"},
    }
    run_batch(spark, cfg)
    got = spark.read.option("basePath", str(tmp_path / "logs")).parquet(str(tmp_path / "logs"))
    by_route = {r[ROUTE]: r["n"] for r in got.groupBy(ROUTE).agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "logs-INFO" in by_route and "logs-" in by_route  # malformed rows → empty level
    assert sum(by_route.values()) == got.count()


def test_rate_source_is_streaming(spark):
    df = build_source(spark, {"target": "rate", "rows_per_second": 5})
    assert df.isStreaming and "message" in df.columns
