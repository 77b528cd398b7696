"""Round-5g operators: leakage-safe cluster split and conversation
shared-prefix analysis."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from log_formatter_spark.operators import corpus, dedup
from log_formatter_spark.transcripts import prefix_share, transcripts_from_events


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_cluster_split_has_zero_cross_split_leakage(spark, sf_dir):
    """The defining property: running the contamination AUDIT over the
    cluster-granular split finds NOTHING — every near-dup pair's two
    sides carry the same split label by construction."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.minhash_pairs(docs, n=3, min_est=0.5)
    split = corpus.cluster_split(docs, pairs)
    leaks = corpus.split_contamination(docs, pairs, split)
    assert leaks.count() == 0
    # and the pair set itself is non-trivial, else the pin is vacuous
    assert pairs.count() > 0


def test_cluster_split_refines_per_doc_split(spark, sf_dir):
    """A singleton component's cluster_id is its own doc_id, so its
    bucket/split assignment is IDENTICAL to the per-doc hash split —
    migrating to the safe split only moves clustered docs."""
    from log_formatter_spark.contract import _dataset_split

    docs = _docs(spark, sf_dir)
    pairs = dedup.minhash_pairs(docs, n=3, min_est=0.5)
    cs = corpus.cluster_split(docs, pairs)
    per_doc = _dataset_split(spark, sf_dir).select(
        "doc_id", F.col("split").alias("doc_split")
    )
    clustered = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    moved = (
        cs.join(per_doc, "doc_id")
        .where(F.col("split") != F.col("doc_split"))
        .join(clustered, "doc_id", "left_anti")
    )
    assert moved.count() == 0


def test_cluster_split_groups_agree(spark):
    """All members of one component share bucket and split."""
    docs = spark.createDataFrame([Row(doc_id=i) for i in range(1, 7)])
    pairs = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3), Row(doc_a=4, doc_b=5)]
    )
    rows = corpus.cluster_split(docs, pairs).collect()
    by_cluster: dict[int, set] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add((r["bucket"], r["split"]))
    assert all(len(v) == 1 for v in by_cluster.values())
    assert set(by_cluster) == {1, 4, 6}


def test_prefix_share_known_depths(spark):
    """Three conversations: a and b share their first 2 turns then
    diverge; c shares nothing. Full-duplicate pair d/e pegs ppm at
    exactly 1000000."""
    rows = []
    for conv, texts in {
        "a": ["hello", "how can i help", "alpha"],
        "b": ["hello", "how can i help", "beta", "gamma"],
        "c": ["different opener", "x"],
        "d": ["same", "same2"],
        "e": ["same", "same2"],
    }.items():
        rows += [
            Row(conv_id=conv, turn_idx=i, text=t) for i, t in enumerate(texts)
        ]
    got = {
        r["conv_id"]: (r["n_turns"], r["shared_depth"], r["shared_ppm"])
        for r in prefix_share(spark.createDataFrame(rows)).collect()
    }
    assert got == {
        "a": (3, 2, 666666),
        "b": (4, 2, 500000),
        "c": (2, 0, 0),
        "d": (2, 2, 1000000),
        "e": (2, 2, 1000000),
    }


def test_prefix_share_null_text_is_its_own_value(spark):
    """A NULL first turn must NOT masquerade as a neighbor's prefix
    (the dropped-NULL slice-misalignment hazard): conv n starts NULL,
    conv a starts 'hello' — no sharing. Two convs BOTH starting NULL
    do share (NULL is a value, consistently)."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("text", StringType()),
        ]
    )
    rows = [
        ("a", 0, "hello"),
        ("a", 1, "x"),
        ("n", 0, None),
        ("n", 1, "x"),
        ("m", 0, None),
        ("m", 1, "y"),
    ]
    got = {
        r["conv_id"]: r["shared_depth"]
        for r in prefix_share(spark.createDataFrame(rows, schema)).collect()
    }
    assert got == {"a": 0, "n": 1, "m": 1}


def test_prefix_share_on_empty_input(spark, sf_dir):
    out = prefix_share(transcripts_from_events(spark, sf_dir).limit(0))
    assert out.count() == 0
    assert out.columns == ["conv_id", "n_turns", "shared_depth", "shared_ppm"]


def test_cluster_split_on_empty_docs(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(0)
    pairs = dedup.minhash_pairs(docs, n=3, min_est=0.5)
    out = corpus.cluster_split(docs, pairs)
    assert out.count() == 0
    assert out.columns == ["doc_id", "cluster_id", "bucket", "split"]
