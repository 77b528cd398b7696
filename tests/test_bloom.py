"""Property tests for the cross-engine Bloom membership sketch
(functions.sketch.bloom_membership).

The contract replica proves Spark≡DuckDB on the driver fixture; these
pin the structural guarantees: a Bloom filter NEVER false-negatives, the
filter is m/32 words regardless of corpus size, and growing m drives the
false-positive count down.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.functions import sketch


def _keys(spark, vals, with_id=False):
    if with_id:
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "doc_id long, key string"
        )
    return spark.createDataFrame([(v,) for v in vals], "key string")


CORPUS = [f"corpus-key-{i}" for i in range(200)]
MEMBERS = CORPUS[::7]  # every 7th corpus key also probed
NOVEL = [f"novel-key-{i}" for i in range(150)]


@pytest.mark.parametrize("m,k", [(256, 2), (1024, 3), (8192, 4)])
def test_no_false_negatives_ever(spark, m, k):
    out = sketch.bloom_membership(
        _keys(spark, CORPUS), _keys(spark, MEMBERS + NOVEL, with_id=True), m=m, k=k
    )
    assert out.where(F.col("is_member") & ~F.col("bloom_hit")).count() == 0
    # and every probed member is actually marked a member
    assert out.where("is_member").count() == len(MEMBERS)


def test_filter_word_count_bounded(spark):
    m = 1024
    pos = sketch._bloom_pos_arr("key", m, 3)
    words = (
        _keys(spark, CORPUS)
        .select(F.explode(pos).alias("pos"))
        .select(F.expr("pos DIV 32").alias("word"))
        .distinct()
    )
    n = words.count()
    assert n <= m // 32
    bounds = words.agg(F.min("word"), F.max("word")).collect()[0]
    assert bounds[0] >= 0 and bounds[1] < m // 32


def test_fp_count_monotone_in_m(spark):
    corpus = _keys(spark, CORPUS)
    batch = _keys(spark, NOVEL, with_id=True)
    fps = []
    for m in [256, 2048, 1 << 15]:
        out = sketch.bloom_membership(corpus, batch, m=m, k=3)
        fps.append(out.where(F.col("bloom_hit") & ~F.col("is_member")).count())
    assert fps[0] >= fps[1] >= fps[2]
    assert fps[2] == 0  # 32k bits over 200 keys: FP vanishes
    assert fps[0] > 0  # 256 bits over 200 keys: saturated, FPs certain
