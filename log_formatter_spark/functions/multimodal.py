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
    DoubleType,
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


FRAME_SIZE = 16
FRAME_STRIDE = 2  # keep every 2nd frame


def frame_sample(
    media: DataFrame, frame_size: int = FRAME_SIZE, stride: int = FRAME_STRIDE
) -> DataFrame:
    """Frame sampling over a raw media buffer: cut the payload into
    fixed-size frames and keep every ``stride``-th one.

    For RAW fixed-size frame buffers (video planes, PCM audio blocks)
    byte-slicing IS the real operation, so this stays fully declarative:
    posexplode over the kept-frame index sequence + ``substring`` on the
    payload — whole-stage codegen, no Python, and each output row
    carries only its frame slice (the full payload is never duplicated
    per frame). CONTAINER-format sampling (mp4/mkv) needs an ffmpeg
    demux and would plug into the mapInPandas seam like
    :func:`resize_pooled`. Frames are sliced on the decoded character
    axis (payloads here are UTF-8 text bytes; char==byte for the ASCII
    fixtures) so the DuckDB oracle renders identically.
    """
    text = F.decode(F.col("payload"), "UTF-8")
    n_frames_kept = F.floor((F.length(text) + frame_size * stride - 1) / (frame_size * stride))
    idx = F.explode(F.sequence(F.lit(0), n_frames_kept.cast("int") - 1)).alias("frame_idx")
    framed = media.where(F.length(text) > 0).select("doc_id", text.alias("t"), idx)
    frame = F.substring(F.col("t"), F.col("frame_idx") * frame_size * stride + 1, frame_size)
    return framed.select(
        "doc_id",
        "frame_idx",
        F.length(frame).cast("int").alias("frame_len"),
        F.md5(F.encode(frame, "UTF-8")).alias("frame_md5"),
    )


def frame_sample_sql(
    src: str = "documents",
    frame_size: int = FRAME_SIZE,
    stride: int = FRAME_STRIDE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    step = frame_size * stride
    return f"""
SELECT CAST({id_col} AS BIGINT) AS doc_id,
       CAST(f.i AS INTEGER) AS frame_idx,
       CAST(length(substr({text_col}, f.i * {step} + 1, {frame_size})) AS INTEGER) AS frame_len,
       md5(substr({text_col}, f.i * {step} + 1, {frame_size})) AS frame_md5
FROM {src},
     LATERAL (SELECT unnest(generate_series(0,
                CAST(ceil(length({text_col}) / {step}.0) AS BIGINT) - 1)) AS i) f
WHERE length({text_col}) > 0
"""


RESIZE_BUCKETS = 8


def resize_pooled(
    media: DataFrame, width: int = RESIZE_BUCKETS, decode_stub: str = "fake"
) -> DataFrame:
    """Resize/downsample through the codec seam: mean-pool the payload
    into ``width`` buckets (position p → bucket p·width/len), one value
    per bucket.

    This is the mapInPandas stage where a real resize (PIL
    ``Image.resize``, librosa resample) plugs in — the Arrow batch
    shape, output schema and partitioning are the production contract;
    only the inner kernel is the deterministic stand-in (integer sums
    are exact, one IEEE division per bucket → bit-identical to the
    DuckDB oracle)."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("bucket", IntegerType()),
            StructField("v", DoubleType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media resize requires a codec library (PIL/librosa) "
                    "not present in this environment"
                )
            ids, buckets, vals = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = payload.decode("utf-8")
                if not s:
                    continue
                sums = [0] * width
                counts = [0] * width
                for p, ch in enumerate(s):
                    b = p * width // len(s)
                    sums[b] += ord(ch)
                    counts[b] += 1
                for b in range(width):
                    if counts[b]:
                        ids.append(doc_id)
                        buckets.append(b)
                        vals.append(float(sums[b]) / counts[b])
            yield pd.DataFrame(
                {"doc_id": ids, "bucket": pd.array(buckets, dtype="int32"), "v": vals}
            )

    return media.mapInPandas(_resize, schema=schema)


def resize_pooled_sql(
    src: str = "documents",
    width: int = RESIZE_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    return f"""
SELECT CAST({id_col} AS BIGINT) AS doc_id,
       CAST(bucket AS INTEGER) AS bucket,
       CAST(s AS DOUBLE) / n AS v
FROM (
  SELECT {id_col}, (c.p * {width}) // length({text_col}) AS bucket,
         sum(unicode(substr({text_col}, c.p + 1, 1))) AS s, count(*) AS n
  FROM {src},
       LATERAL (SELECT unnest(generate_series(0, length({text_col}) - 1)) AS p) c
  WHERE length({text_col}) > 0
  GROUP BY {id_col}, (c.p * {width}) // length({text_col})
)
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
