"""Multimodal binary-column plumbing: schema, Arrow batch shape, stub
decode determinism, and the explicit NotImplementedError seam where a
real codec plugs in."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.functions.multimodal import (
    FEATURE_SCHEMA,
    attach_payload,
    decode_features,
    resize_pooled,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).cache()


def test_payload_is_binary_with_metadata(spark, docs):
    media = attach_payload(docs)
    types = dict(media.dtypes)
    assert types["payload"] == "binary"
    assert types["n_bytes"] == "int"
    row = media.orderBy("doc_id").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])


def test_decode_stub_deterministic_features(spark, docs):
    media = attach_payload(docs)
    feats = decode_features(media, n_features=4)
    assert feats.schema == FEATURE_SCHEMA
    a = {r["doc_id"]: r["feature"] for r in feats.collect()}
    b = {r["doc_id"]: r["feature"] for r in decode_features(media, n_features=4).collect()}
    assert a == b  # deterministic across runs
    assert all(len(v) == 4 for v in a.values())
    # fake features derive from payload bytes: first byte of text
    one = docs.orderBy("doc_id").first()
    assert a[one["doc_id"]][0] == float(one["text"].encode()[0])


def test_decode_raise_stub_marks_codec_seam(spark, docs):
    media = attach_payload(docs)
    with pytest.raises(Exception) as exc_info:
        decode_features(media, decode_stub="raise").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_empty_payload_safe(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    out = decode_features(attach_payload(df)).collect()
    assert out[0]["feature"] == [0.0, 0.0, 0.0, 0.0]
    assert resize_pooled(attach_payload(df)).collect() == []


def test_empty_payload_mixed_batch(spark):
    """Regression (r3 ADVICE): a mixed ASCII batch whose FINAL payload is
    empty indexed past the flat buffer (offsets[last] == big.size) on the
    numpy path; a mid-batch empty row read its neighbour's first byte.
    Both must decode exactly like the per-row Python kernel."""
    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "xyz"), (4, "")],
        "doc_id long, text string",
    ).coalesce(1)
    media = attach_payload(df)
    fast = _rows(decode_features(media), ("doc_id",))
    ref = _rows(decode_features(media, kernel="python"), ("doc_id",))
    assert fast == ref
    by_id = {r[0]: r[-1] for r in fast}
    assert by_id[2] == [0.0, 0.0, 0.0, 0.0]
    assert by_id[4] == [0.0, 0.0, 0.0, 0.0]
    assert by_id[1] == [float(ord("a")), float(ord("b"))] * 2


def _rows(df, key):
    return sorted((tuple(r) for r in df.collect()), key=lambda t: t[: len(key)])


def test_vectorized_kernels_equal_python_reference(spark, docs):
    """The numpy fast path must be bit-identical to the per-row Python
    kernel (integer byte sums are exact; one IEEE division per bucket)."""
    media = attach_payload(docs)
    fast = _rows(decode_features(media, n_features=6), ("doc_id",))
    ref = _rows(decode_features(media, n_features=6, kernel="python"), ("doc_id",))
    assert fast == ref
    fast_r = _rows(resize_pooled(media, width=8), ("doc_id", "bucket"))
    ref_r = _rows(resize_pooled(media, width=8, kernel="python"), ("doc_id", "bucket"))
    assert fast_r == ref_r


def test_non_ascii_batch_falls_back_exactly(spark):
    """A non-ASCII payload flips the batch to the char-exact Python
    kernel; features are code points, not bytes."""
    df = spark.createDataFrame(
        [(1, "héllo wörld"), (2, "plain ascii"), (3, "")],
        "doc_id long, text string",
    )
    media = attach_payload(df)
    out = {r["doc_id"]: r["feature"] for r in decode_features(media, n_features=3).collect()}
    assert out[1] == [float(ord("h")), float(ord("é")), float(ord("l"))]
    assert out[3] == [0.0, 0.0, 0.0]
    fast_r = _rows(resize_pooled(media, width=4), ("doc_id", "bucket"))
    ref_r = _rows(resize_pooled(media, width=4, kernel="python"), ("doc_id", "bucket"))
    assert fast_r == ref_r
