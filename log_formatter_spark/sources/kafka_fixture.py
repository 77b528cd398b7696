"""Kafka-frame fixture + the shared value-decode semantics.

The reference's second E2E gate is a dockerized kafka round-trip
(reference Makefile:43-51, test/kafka-service.yml:1-22) that no broker
in this sandbox can serve. The decode semantics it exercises
(agent/input/kafka/kafka.go:159-173: value bytes either JSON-decoded
into doc fields, or wrapped raw as ``{"message": value}``) are instead
executed against a deterministic kafka-frame-shaped table: the exact
``(key, value, topic, partition, offset, timestamp)`` column set the
spark-sql-kafka reader produces, synthesized from the transcripts view.

``decode_kafka_value`` is the ONE decode implementation, shared by the
streaming kafka source (sources/readers.py) and the oracle-checked
batch contract queries here — so the code the broker path would run is
the code the driver hash-checks.

Divergence (documented in SURVEY §7.3): the reference Fatalf-crashes on
malformed JSON (kafka.go:163-166); here a malformed value yields a null
doc (``decode_ok=false``) and flows to the dead-letter sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from log_formatter_spark.functions.hashing import MD5_60_SQL, md5_60

N_KAFKA_PARTITIONS = 4

# Declared value schema for JSON-mode decode (reference kafka.go:26-35
# config `schema: json`); ts travels as a formatted string so the round
# trip is timezone-free and oracle-exact.
KAFKA_JSON_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts_str string"
)


def kafka_frames(
    transcripts: DataFrame,
    value_format: str = "json",
    n_partitions: int = N_KAFKA_PARTITIONS,
    topic: str = "transcripts",
    corrupt_every: int | None = None,
) -> DataFrame:
    """Deterministic kafka-frame table from the transcripts view.

    key = conv_id bytes (kafka's usual partition key), partition =
    hash(conv_id) mod N (same placement a keyed producer gives),
    offset = arrival order within the partition (total order via
    (ts, conv_id, turn_idx), so reruns at any parallelism agree).

    ``corrupt_every``: every Nth turn per the turn_idx counter gets an
    unparseable value (JSON mode only) to exercise the dead-letter path.
    """
    ts_str = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    if value_format == "json":
        payload = F.to_json(
            F.struct(
                F.col("conv_id"),
                F.col("turn_idx"),
                F.col("role"),
                F.col("text"),
                F.col("tool"),
                ts_str.alias("ts_str"),
            )
        )
        if corrupt_every:
            payload = F.when(
                F.col("turn_idx") % corrupt_every == 0,
                F.concat(F.lit("corrupt!"), F.col("conv_id")),
            ).otherwise(payload)
    elif value_format == "raw":
        payload = F.col("text")
    else:
        raise ValueError(f"unknown value_format: {value_format!r}")

    part = F.pmod(md5_60(F.col("conv_id")), F.lit(n_partitions)).cast("int")
    framed = transcripts.select(
        F.encode(F.col("conv_id"), "UTF-8").alias("key"),
        F.encode(payload, "UTF-8").alias("value"),
        F.lit(topic).alias("topic"),
        part.alias("partition"),
        F.col("ts").alias("timestamp"),
        # carried only to make the offset assignment deterministic
        F.col("conv_id").alias("_k"),
        F.col("turn_idx").alias("_t"),
    )
    w = Window.partitionBy("partition").orderBy("timestamp", "_k", "_t")
    return framed.select(
        "key",
        "value",
        "topic",
        "partition",
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("offset"),
        "timestamp",
    )


def decode_kafka_value(
    frames: DataFrame, schema: str = "json", json_schema: str = KAFKA_JSON_SCHEMA
) -> DataFrame:
    """The reference's two value-decode modes over kafka-shaped frames.

    json: value bytes parsed against the declared schema; a malformed
    value yields null fields + ``decode_ok=false`` (dead-letter, not the
    reference's Fatalf). Malformed detection uses the JSON parser's own
    corrupt-record channel (``columnNameOfCorruptRecord``) — a null-field
    heuristic would misclassify valid-but-sparse documents. raw: value
    wrapped as ``message``. Passthrough columns (partition, offset,
    timestamp) are preserved so downstream lineage can cite the frame
    coordinates.
    """
    raw = F.col("value").cast("string")
    if schema == "json":
        doc = F.from_json(
            raw,
            json_schema + ", _corrupt string",
            {"columnNameOfCorruptRecord": "_corrupt"},
        )
        fields = [f.split(" ")[0] for f in json_schema.split(", ")]
        return frames.select(
            "partition", "offset", "timestamp", doc.alias("doc")
        ).select(
            "partition",
            "offset",
            "timestamp",
            *[F.col(f"doc.{f}").alias(f) for f in fields],
            F.col("doc._corrupt").isNull().alias("decode_ok"),
        )
    return frames.select("partition", "offset", "timestamp", raw.alias("message"))


# --- DuckDB oracle renderings (append after TRANSCRIPT_CTES) --------------


def _frames_ctes(n_partitions: int, corrupt_every: int | None) -> str:
    h = MD5_60_SQL.format(x="conv_id")
    corrupt = (
        f"(turn_idx % {corrupt_every} = 0)" if corrupt_every else "FALSE"
    )
    return f"""
frames AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
         CAST({h} % {n_partitions} AS INTEGER) AS kpart,
         {corrupt} AS corrupt
  FROM transcripts
),
offs AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY kpart ORDER BY ts, conv_id, turn_idx) - 1 AS BIGINT) AS koffset
  FROM frames
)"""


def kafka_decode_json_sql(
    n_partitions: int = N_KAFKA_PARTITIONS, corrupt_every: int | None = None
) -> str:
    """Expected decode output: the original fields for well-formed
    frames, nulls + decode_ok=false for corrupted ones — i.e. the JSON
    round trip must be lossless."""
    null_if = lambda c: f"CASE WHEN corrupt THEN NULL ELSE {c} END AS {c}"
    return f""", {_frames_ctes(n_partitions, corrupt_every)}
SELECT kpart, koffset,
       {null_if("conv_id")}, {null_if("turn_idx")}, {null_if("role")},
       {null_if("text")}, {null_if("tool")}, {null_if("ts_str")},
       NOT corrupt AS decode_ok
FROM offs
"""


def kafka_decode_raw_sql(n_partitions: int = N_KAFKA_PARTITIONS) -> str:
    return f""", {_frames_ctes(n_partitions, None)}
SELECT kpart, koffset, text AS message
FROM offs
"""


def kafka_pipeline_routed_sql(
    pattern: str,
    n_partitions: int = N_KAFKA_PARTITIONS,
    corrupt_every: int | None = None,
) -> str:
    """Oracle for the FULL broker-free kafka pipeline (the reference's
    Makefile kafka E2E gate, reference Makefile:43-51, re-expressed as a
    driver-hashed row): frames → json decode (corrupt → dead-letter
    nulls) → parse → dynamic route template → per-route counts."""
    return f""", {_frames_ctes(n_partitions, corrupt_every)},
kdecoded AS (
  SELECT CASE WHEN corrupt THEN NULL ELSE text END AS text,
         CASE WHEN corrupt THEN NULL ELSE role END AS role,
         NOT corrupt AS decode_ok
  FROM offs
),
kparsed AS (
  SELECT *, CASE WHEN text IS NOT NULL AND regexp_matches(text, '{pattern}')
                 THEN regexp_extract(text, '{pattern}', 2) END AS level
  FROM kdecoded
)
SELECT 'logs-' || coalesce(level, '') || '-' || coalesce(role, '') AS route,
       count(*) AS n,
       CAST(sum(CASE WHEN decode_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_decoded
FROM kparsed GROUP BY 1
"""
