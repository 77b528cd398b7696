"""Input source registry.

Mirrors the reference's name→factory input registry (populated by
``init()`` side effects of blank imports, reference
agent/include/list.go:4-16, resolved at agent/input/input.go:53-71) as a
plain dict of Python builders; ``register_source`` replaces `.so` plugin
loading (util/plugin.go:22-39).

Reference inputs → Spark readers:
- console (stdin lines → {"message": line}, console.go:30-35)
    → "file" text reader / "rate" stream for smoke tests
- kafka (sarama consumer-group JSON decode, kafka.go:159-173)
    → "kafka" readStream + from_json (config-complete; needs a broker,
      so in-sandbox tests only build the plan)
- elasticsearch (search-hit _source docs, elasticsearch.go:162-166)
    → "parquet"/"json" batch scans with a ``where`` predicate re-run per
      poll — a parameterized table scan
- (historical) file input referenced by the reference's own E2E configs
  (test/file-file-test.yml) → "file"
Plus the engine-native sources: events-derived and synthetic transcripts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SourceFn = Callable[[SparkSession, dict], DataFrame]


def _file_source(spark: SparkSession, cfg: dict) -> DataFrame:
    """Text file → {"message": line} docs (reference console.go:30-35
    doc shape; file target per test/file-file-test.yml)."""
    df = spark.read.text(cfg["path"])
    return df.select(F.col("value").alias("message"))


def _parquet_source(spark: SparkSession, cfg: dict) -> DataFrame:
    df = spark.read.parquet(cfg["path"])
    if cfg.get("where"):
        df = df.where(cfg["where"])
    return df


def _json_source(spark: SparkSession, cfg: dict) -> DataFrame:
    df = spark.read.json(cfg["path"])
    if cfg.get("where"):
        df = df.where(cfg["where"])
    return df


def _rate_source(spark: SparkSession, cfg: dict) -> DataFrame:
    """Streaming smoke source (stand-in for the reference's 1-line/s
    console input, console.go:30-35)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", int(cfg.get("rows_per_second", 1)))
        .load()
        .select(F.col("value").cast("string").alias("message"), "timestamp")
    )


def _kafka_source(spark: SparkSession, cfg: dict) -> DataFrame:
    """Kafka-shaped source (reference kafka.go:26-35,159-173): value
    bytes either JSON-decoded against a declared schema or wrapped as
    {"message": raw}. The reference crashes on malformed JSON
    (kafka.go:163-166 Fatalf); we dead-letter instead: from_json yields
    null structs, kept as parse failures (documented divergence)."""
    from log_formatter_spark.sources.kafka_fixture import (
        KAFKA_JSON_SCHEMA,
        decode_kafka_value,
    )

    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", ",".join(cfg["brokers"]))
        .option("subscribe", cfg["topic"])
    )
    if cfg.get("group_name"):
        reader = reader.option("kafka.group.id", cfg["group_name"])
    df = reader.load()
    # decode is shared with the broker-free fixture path, where the
    # driver oracle-checks it (sources/kafka_fixture.py)
    if cfg.get("schema") == "json":
        return decode_kafka_value(
            df, "json", cfg.get("json_schema", KAFKA_JSON_SCHEMA)
        )
    return decode_kafka_value(df, "raw")


def _kafka_fixture_source(spark: SparkSession, cfg: dict) -> DataFrame:
    """Broker-free kafka-shaped source: deterministic frames synthesized
    from the transcripts view, decoded by the SAME decode_kafka_value
    the live kafka source uses — lets a YAML config drive the kafka
    decode path end-to-end with no broker (sources/kafka_fixture.py)."""
    from log_formatter_spark.sources.kafka_fixture import (
        KAFKA_JSON_SCHEMA,
        decode_kafka_value,
        kafka_frames,
    )
    from log_formatter_spark.transcripts import transcripts_from_events

    t = transcripts_from_events(spark, cfg["sf_dir"])
    frames = kafka_frames(
        t,
        value_format="json" if cfg.get("schema", "json") == "json" else "raw",
        corrupt_every=cfg.get("corrupt_every"),
    )
    if cfg.get("schema", "json") == "json":
        return decode_kafka_value(frames, "json", cfg.get("json_schema", KAFKA_JSON_SCHEMA))
    return decode_kafka_value(frames, "raw")


def _events_transcripts(spark: SparkSession, cfg: dict) -> DataFrame:
    from log_formatter_spark.transcripts import transcripts_from_events

    return transcripts_from_events(spark, cfg["sf_dir"])


def _synthetic(spark: SparkSession, cfg: dict) -> DataFrame:
    from log_formatter_spark.transcripts import synthetic_transcripts

    return synthetic_transcripts(
        spark, int(cfg["n_turns"]), cfg.get("n_convs")
    )


def _stream_transcripts(spark: SparkSession, cfg: dict) -> DataFrame:
    from log_formatter_spark.streaming.job import stream_transcripts

    return stream_transcripts(spark, cfg["path"], cfg.get("max_files_per_trigger"))


SOURCES: dict[str, SourceFn] = {
    "file": _file_source,
    "parquet": _parquet_source,
    "json": _json_source,
    "rate": _rate_source,
    "kafka": _kafka_source,
    "kafka_fixture": _kafka_fixture_source,
    "events_transcripts": _events_transcripts,
    "synthetic_transcripts": _synthetic,
    "stream_transcripts": _stream_transcripts,
}


def register_source(name: str, fn: SourceFn) -> None:
    SOURCES[name] = fn


def build_source(spark: SparkSession, cfg: dict) -> DataFrame:
    """Resolve the single configured input (the reference allows exactly
    one input target, agent/input/input.go:50-52)."""
    target = cfg.get("target")
    if not target or target not in SOURCES:
        raise ValueError(f"unknown or missing input target: {target!r}")
    return SOURCES[target](spark, cfg)
