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

import numpy as np
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


def _batch_bytes(payloads) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a batch of ``bytes`` payloads into one uint8 buffer.

    Returns ``(big, lens, offsets)`` where ``big[offsets[r] : offsets[r]
    + lens[r]]`` is row *r*. One ``b"".join`` is the only per-row Python
    loop; everything downstream indexes the flat buffer with numpy."""
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
    big = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(lens) else lens
    return big, lens, offsets


def decode_features(
    media: DataFrame, n_features: int = 4, decode_stub: str = "fake", kernel: str = "auto"
) -> DataFrame:
    """Arrow-batched decode → fixed-width feature vector per payload.

    The pandas iterator signature is the real production shape; only the
    innermost byte→feature step is stubbed. ``kernel="auto"`` runs the
    vectorized numpy path (flat uint8 buffer + fancy indexing — exact
    for ASCII batches, where byte == code point) and falls back to the
    per-row Python kernel only for batches containing non-ASCII bytes;
    ``kernel="python"`` forces the reference kernel (equality with the
    vectorized path is pinned in tests/test_multimodal.py)."""

    def _decode_python(pdf: pd.DataFrame) -> list[list[float]]:
        # Reference kernel: feature i = code point of the (i mod len)-th
        # character of the UTF-8-decoded payload. The char-based
        # definition keeps an exact DuckDB rendering (decode_features_sql)
        # for the driver's value-hash oracle.
        return [
            [float(ord(s[i % len(s)])) if s else 0.0 for i in range(n_features)]
            for s in (b.decode("utf-8") for b in pdf["payload"])
        ]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires an image/audio codec library "
                    "(PIL/torchaudio/ffmpeg) not present in this environment"
                )
            big, lens, offsets = _batch_bytes(pdf["payload"])
            if kernel == "python" or (big.size and big.max() >= 128):
                # Non-ASCII: byte != char position; take the exact path.
                feats = _decode_python(pdf)
            else:
                # Empty rows must not index the flat buffer at all: a
                # trailing empty payload has offsets[r] == big.size (out of
                # bounds), and a mid-batch one would read its neighbour's
                # first byte. Clamp their offsets to 0 (always in bounds
                # when big.size > 0), then zero their output rows.
                safe = np.maximum(lens, 1)
                off = np.where(lens > 0, offsets, 0)
                pos = off[:, None] + (np.arange(n_features)[None, :] % safe[:, None])
                mat = (
                    big[pos].astype(np.float32)
                    if big.size
                    else np.zeros((len(lens), n_features), np.float32)
                )
                mat[lens == 0] = 0.0
                feats = mat.tolist()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": lens.astype("int32"),
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
    media: DataFrame, width: int = RESIZE_BUCKETS, decode_stub: str = "fake",
    kernel: str = "auto",
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

    def _resize_python(pdf: pd.DataFrame) -> pd.DataFrame:
        # Reference per-char kernel (kept for the non-ASCII fallback and
        # the vectorized-equality pin in tests).
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
        return pd.DataFrame(
            {"doc_id": ids, "bucket": pd.array(buckets, dtype="int32"), "v": vals}
        )

    def _resize_numpy(pdf: pd.DataFrame, big, lens) -> pd.DataFrame:
        # All-ASCII batch: byte value == code point, so the whole pooling
        # collapses to two bincounts over the flat buffer. Integer byte
        # sums are exact in float64 (≤ 255·len ≪ 2^53) and the single
        # division per bucket is the same IEEE op as the Python kernel —
        # bit-identical output.
        keep = lens > 0
        k_lens = lens[keep]
        n_kept = len(k_lens)
        if n_kept == 0:
            return pd.DataFrame(
                {"doc_id": pd.array([], dtype="int64"),
                 "bucket": pd.array([], dtype="int32"), "v": []}
            )
        doc_idx = np.repeat(np.arange(n_kept), k_lens)
        local = np.arange(k_lens.sum()) - np.repeat(np.cumsum(k_lens) - k_lens, k_lens)
        if keep.all():
            k_big = big
        else:
            char_keep = np.repeat(keep, lens)
            k_big = big[char_keep]
        bucket = local * width // np.repeat(k_lens, k_lens)
        key = doc_idx * width + bucket
        minlen = n_kept * width
        sums = np.bincount(key, weights=k_big.astype(np.float64), minlength=minlen)
        counts = np.bincount(key, minlength=minlen)
        mask = counts > 0
        k_ids = pdf["doc_id"].to_numpy()[keep]
        out_ids = np.repeat(k_ids, width)[mask]
        out_buckets = np.tile(np.arange(width, dtype=np.int32), n_kept)[mask]
        return pd.DataFrame(
            {
                "doc_id": out_ids,
                "bucket": pd.array(out_buckets, dtype="int32"),
                "v": sums[mask] / counts[mask],
            }
        )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media resize requires a codec library (PIL/librosa) "
                    "not present in this environment"
                )
            big, lens, _ = _batch_bytes(pdf["payload"])
            if kernel == "python" or (big.size and big.max() >= 128):
                yield _resize_python(pdf)
            else:
                yield _resize_numpy(pdf, big, lens)

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
