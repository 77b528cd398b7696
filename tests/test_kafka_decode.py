"""Kafka frame fixture + decode semantics beyond the contract pairs:
adversarial payload round trips and raw-mode wrapping.

The contract queries (kafka_decode_json / kafka_decode_raw) hash-check
the fixture-driven decode against DuckDB over fixture text; these tests
push text the fixtures never contain (quotes, backslashes, newlines,
non-ASCII, empty) through the JSON round trip.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from log_formatter_spark.sources.kafka_fixture import (
    decode_kafka_value,
    kafka_frames,
)


def _transcripts(spark, rows):
    return spark.createDataFrame(
        [
            (f"conv-{i:08d}", i, "user", text, "", None)
            for i, text in enumerate(rows)
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("turn_idx")))


ADVERSARIAL = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",)
    ),
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(ADVERSARIAL, min_size=1, max_size=10))
def test_json_round_trip_is_lossless_for_any_text(spark, texts):
    t = _transcripts(spark, texts)
    dec = decode_kafka_value(kafka_frames(t, "json"), "json")
    got = {r["conv_id"]: (r["text"], r["decode_ok"]) for r in dec.collect()}
    assert len(got) == len(texts)
    for i, text in enumerate(texts):
        assert got[f"conv-{i:08d}"] == (text, True)


def test_raw_mode_wraps_any_bytes(spark):
    texts = ['{"not": "parsed"}', "plain line", ""]
    t = _transcripts(spark, texts)
    dec = decode_kafka_value(kafka_frames(t, "raw"), "raw")
    assert sorted(r["message"] for r in dec.collect()) == sorted(texts)


def test_offsets_are_dense_per_partition(spark, sf_dir):
    from log_formatter_spark.transcripts import transcripts_from_events

    frames = kafka_frames(transcripts_from_events(spark, sf_dir), "json")
    per_part = (
        frames.groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n"), F.min("offset").alias("lo"), F.max("offset").alias("hi"))
        .collect()
    )
    assert per_part, "no partitions produced"
    for r in per_part:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1
