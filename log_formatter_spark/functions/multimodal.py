"""Multimodal (image/audio/video) column plumbing.

The engine treats media as opaque ``binary`` payload columns plus a
typed metadata struct — the Spark-side contract (schema, partitioning,
Arrow batch shape) is real and tested; the actual codec step is stubbed
because no image/audio libraries exist in this container:

- ``decode_stub="fake"``  → deterministic pseudo-features derived from
  the payload bytes (so downstream plumbing is testable end-to-end).
- ``decode_stub="raise"`` → NotImplementedError, marking exactly where
  a real decoder (PIL / torchaudio / ffmpeg) plugs in.

At scale: payloads live in the table as binary columns (Parquet/Iceberg
keeps them out of unrelated column scans); decode runs via
``mapInPandas`` so each Arrow batch crosses to Python once, and batch
size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` to
keep executor memory flat regardless of payload size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize the opaque binary payload column + typed metadata.

    In production the payload arrives from the source table; here it is
    synthesized deterministically from text bytes so tests have real
    binary columns to push through the plumbing.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("int").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


def decode_features(
    media: DataFrame, n_features: int = 4, decode_stub: str = "fake"
) -> DataFrame:
    """Arrow-batched decode → fixed-width feature vector per payload.

    The pandas iterator signature is the real production shape; only the
    innermost byte→feature step is stubbed.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires an image/audio codec library "
                    "(PIL/torchaudio/ffmpeg) not present in this environment"
                )
            # Deterministic fake decode: feature i = code point of the
            # (i mod len)-th character of the UTF-8-decoded payload. For
            # ASCII payloads this equals the raw byte value; the
            # char-based definition keeps an exact DuckDB rendering
            # (decode_features_sql) for the driver's value-hash oracle.
            feats = [
                [
                    float(ord(s[i % len(s)])) if s else 0.0
                    for i in range(n_features)
                ]
                for s in (b.decode("utf-8") for b in pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].str.len().astype("int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_decode, schema=FEATURE_SCHEMA)


def decode_features_exploded(
    media: DataFrame, n_features: int = 4, decode_stub: str = "fake"
) -> DataFrame:
    """Driver-contract shape of :func:`decode_features`: the list-valued
    ``feature`` column exploded to scalar ``(feature_idx, feature_value)``
    rows so the result is hashable by the driver's pandas canonicalizer
    (a list column is not). ``feature_value`` is cast to double so the
    schema matches the DuckDB oracle exactly (code points < 2^24 are
    exact in float32, so the float→double cast is lossless)."""
    feats = decode_features(media, n_features=n_features, decode_stub=decode_stub)
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.posexplode("feature"),
    ).select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.col("pos").alias("feature_idx"),
        F.col("col").cast("double").alias("feature_value"),
    )


def decode_features_sql(
    src: str = "documents",
    n_features: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB rendering of the fake decode (exploded contract shape).

    Payloads are UTF-8 text bytes, so ``n_bytes = strlen`` and feature i
    is the code point at character position ``i mod char-length``."""
    return f"""
SELECT CAST({id_col} AS BIGINT) AS doc_id,
       'image/fake' AS media_type,
       CAST(strlen({text_col}) AS INTEGER) AS n_bytes,
       CAST(i AS INTEGER) AS feature_idx,
       CAST(CAST(CASE WHEN length({text_col}) = 0 THEN 0.0
                      ELSE unicode(substr({text_col}, 1 + (i % length({text_col})), 1))
                 END AS FLOAT) AS DOUBLE) AS feature_value
FROM {src}, range(0, {n_features}) r(i)
"""


def media_metadata(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pure-JVM metadata over the payload column (oracle-checkable)."""
    return attach_payload(df, text_col=text_col, id_col=id_col).select(
        "doc_id", "media_type", "n_bytes", "payload_md5"
    )


def media_metadata_sql(src: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
SELECT CAST({id_col} AS BIGINT) AS doc_id,
       'image/fake' AS media_type,
       CAST(strlen({text_col}) AS INTEGER) AS n_bytes,
       md5({text_col}) AS payload_md5
FROM {src}
"""
