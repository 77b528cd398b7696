"""ngram_novelty (occurrence-weighted n-gram novelty vs a reference
corpus), its streaming twin (the batch definition run verbatim in
complete mode), and stitch_fragments (crawl-fragment tail/head
reassembly): hand-verified counts, fixture partition properties,
micro-batch slicing invariance, true-pair recovery, and the
boilerplate boundary guard."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from log_formatter_spark.operators.corpus import (
    FRAG_K,
    fragment_fixture,
    ngram_novelty,
    novelty_fixture,
    stitch_candidates,
)

_DOC_SCHEMA = "doc_id bigint, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, _DOC_SCHEMA)


# --- ngram_novelty ----------------------------------------------------------


def test_novelty_counts_hand_case(spark):
    # ref has exactly the grams of "a b c d e f" (two 5-grams);
    # probe doc 10 repeats ref text verbatim -> 0 novel;
    # probe doc 11 shares no 5-gram -> all novel;
    # probe doc 12 overlaps on its first 5-gram only.
    ref = _docs(spark, [(1, "a b c d e f")])
    probe = _docs(
        spark,
        [
            (10, "a b c d e f"),
            (11, "p q r s t u v"),
            (12, "a b c d e zzz"),
        ],
    )
    out = {r["doc_id"]: r for r in ngram_novelty(probe, ref).collect()}
    assert out[10]["n_grams"] == 2 and out[10]["n_novel"] == 0
    assert out[10]["novelty_pct"] == 0
    assert out[11]["n_grams"] == 3 and out[11]["n_novel"] == 3
    assert out[11]["novelty_pct"] == 100
    assert out[12]["n_grams"] == 2 and out[12]["n_novel"] == 1
    assert out[12]["novelty_pct"] == 50


def test_novelty_is_occurrence_weighted(spark):
    # the same novel 5-gram appearing twice counts twice (positions,
    # not distinct grams): "x1 x2 x3 x4 x5" twice = 6 grams, all novel.
    ref = _docs(spark, [(1, "a b c d e")])
    probe = _docs(spark, [(10, "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5")])
    row = ngram_novelty(probe, ref).collect()[0]
    assert row["n_grams"] == 6 and row["n_novel"] == 6


def test_novelty_short_docs_emit_nothing(spark):
    ref = _docs(spark, [(1, "a b c d e f")])
    probe = _docs(spark, [(10, "one two three four")])  # < 5 tokens
    assert ngram_novelty(probe, ref).count() == 0


def test_novelty_fixture_partitions_the_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref, new = novelty_fixture(docs)
    total = docs.count()
    assert ref.count() + new.count() == total
    assert ref.select("doc_id").intersect(new.select("doc_id")).count() == 0


def test_streaming_novelty_slicing_invariant(spark, sf_dir):
    # the streaming twin must equal the batch result at ANY micro-batch
    # slicing: maxFilesPerTrigger=1 and =3 over 4 input files both hash
    # to the batch frame.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref, new = novelty_fixture(docs)
    batch = sorted(
        tuple(r) for r in ngram_novelty(new, ref).collect()
    )
    work = tempfile.mkdtemp(prefix="lfs_test_snov_")
    src = f"{work}/in"
    new.select("doc_id", "text").repartition(4).write.mode("overwrite").parquet(src)
    for i, mft in enumerate((1, 3)):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", mft)
            .parquet(src)
        )
        q = (
            ngram_novelty(stream, ref)
            .writeStream.format("memory")
            .queryName(f"snov_inv_{i}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(tuple(r) for r in spark.table(f"snov_inv_{i}").collect())
        assert got == batch, f"mft={mft} diverged from batch"


def test_novelty_indexed_probe_equals_recompute(spark, sf_dir):
    # probing the persisted gram index must return exactly the
    # recompute form's rows — the artifact carries everything.
    import pytest

    from log_formatter_spark.operators.corpus import write_gram_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref, new = novelty_fixture(docs)
    work = tempfile.mkdtemp(prefix="lfs_test_gramidx_")
    write_gram_index(ref, f"{work}/idx")
    via_index = sorted(
        tuple(r)
        for r in ngram_novelty(
            new, ref_grams=spark.read.parquet(f"{work}/idx")
        ).collect()
    )
    recompute = sorted(tuple(r) for r in ngram_novelty(new, ref).collect())
    assert via_index == recompute
    with pytest.raises(ValueError):
        ngram_novelty(new)
    with pytest.raises(ValueError):
        ngram_novelty(new, ref, ref_grams=spark.read.parquet(f"{work}/idx"))


# --- stitch_fragments -------------------------------------------------------


def test_stitch_recovers_engineered_pair(spark):
    # one 2k-token doc split by hand at m: tail_k(A) == head_k(B).
    toks = [f"w{i}" for i in range(2 * FRAG_K)]
    m = len(toks) // 2
    frag_a = (100, " ".join(toks[: m + FRAG_K]))
    frag_b = (101, " ".join(toks[m:]))
    decoy = (102, " ".join(f"z{i}" for i in range(20)))
    frags = spark.createDataFrame(
        [frag_a, frag_b, decoy], "frag_id bigint, text string"
    )
    out = stitch_candidates(frags).collect()
    assert [(r["a_id"], r["b_id"]) for r in out] == [(100, 101)]
    assert out[0]["boundary"] == " ".join(toks[m : m + FRAG_K])


def test_stitch_fixture_true_pairs_all_recovered(spark, sf_dir):
    # every doc the fixture split must reappear as the (2i, 2i+1) pair
    # unless its boundary tripped the frequency guard; at minimum the
    # pair set must CONTAIN a recovered pair per split doc that joins
    # an unguarded boundary, and every emitted pair must be a genuine
    # tail/head match (checked by reconstruction in the hand test).
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frags = fragment_fixture(docs)
    pairs = {
        (r["a_id"], r["b_id"])
        for r in stitch_candidates(frags).collect()
    }
    # true pairs: a split doc i yields fragments (2i, 2i+1)
    true_pairs = {
        (fid, fid + 1)
        for (fid,) in frags.where(F.col("frag_id") % 2 == 1)
        .select((F.col("frag_id") - 1))
        .collect()
    }
    assert true_pairs, "fixture split nothing — fixture broken"
    # boundaries can legitimately be guard-dropped; require that the
    # recovered set covers the unguarded majority
    recovered = true_pairs & pairs
    assert len(recovered) >= len(true_pairs) * 0.5
    # and nothing self-pairs
    assert all(a != b for a, b in pairs)


def test_stitch_boilerplate_guard_drops_hot_boundary(spark):
    # six fragments ending with the same boilerplate tail and six
    # starting with it: without the guard that is a 6x6 blowup; with
    # max_boundary_docs=4 the boundary is dropped entirely.
    boiler = " ".join(f"b{i}" for i in range(FRAG_K))
    rows = [(i, f"head{i} only unique words here pad pad pad " + boiler) for i in range(6)]
    rows += [(100 + i, boiler + f" tail{i} more unique pad pad pad") for i in range(6)]
    frags = spark.createDataFrame(rows, "frag_id bigint, text string")
    assert stitch_candidates(frags).count() == 0
    assert stitch_candidates(frags, max_boundary_docs=6).count() == 36
