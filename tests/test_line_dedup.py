"""Semantics of corpus.line_dedup (CCNet cross-corpus line dedup): the
globally FIRST occurrence of every exact line — ordered by
(doc_id, position) — survives; every later copy anywhere in the corpus
is stripped; novel lines are untouched; fully-duplicated docs keep a
row with empty clean_text. Plus a randomized brute-force spec check and
the fixed-point property."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.operators import corpus


@pytest.fixture(scope="module")
def out(spark):
    rows = [
        # doc 0 carries the boilerplate first: it keeps everything
        (0, "nav home about\nunique alpha prose\nall rights reserved"),
        # doc 1 repeats doc 0's nav + footer: only its novel line survives
        (1, "nav home about\nunique bravo prose\nall rights reserved"),
        # doc 2 is ENTIRELY doc-0/doc-1 lines: empty clean_text, row kept
        (2, "nav home about\nall rights reserved\nunique alpha prose"),
        # doc 3 repeats its own line: second copy is stripped too
        (3, "self repeated line\nself repeated line\nunique charlie prose"),
        # empty lines never count as lines
        (4, "\n\nunique delta prose\n\n"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r for r in corpus.line_dedup(df).collect()}


def test_first_doc_keeps_everything(out):
    r = out[0]
    assert r["clean_text"] == "nav home about\nunique alpha prose\nall rights reserved"
    assert (r["n_lines"], r["n_kept"]) == (3, 3)


def test_later_copies_stripped_globally(out):
    assert out[1]["clean_text"] == "unique bravo prose"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 1)


def test_fully_duplicated_doc_keeps_empty_row(out):
    assert out[2]["clean_text"] == ""
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (3, 0)


def test_within_doc_repeat_stripped(out):
    assert out[3]["clean_text"] == "self repeated line\nunique charlie prose"
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (3, 2)


def test_empty_lines_ignored(out):
    assert out[4]["clean_text"] == "unique delta prose"
    assert (out[4]["n_lines"], out[4]["n_kept"]) == (1, 1)


def _spec(docs):
    """Brute-force reference: global (doc_id, position) argmin per line."""
    winners: dict[str, tuple[int, int]] = {}
    split = {}
    for did, text in docs:
        lines = [ln for ln in text.split("\n") if ln]
        split[did] = lines
        for p, ln in enumerate(lines, 1):
            if ln not in winners or (did, p) < winners[ln]:
                winners[ln] = (did, p)
    return {
        did: (
            "\n".join(
                ln for p, ln in enumerate(lines, 1) if winners[ln] == (did, p)
            ),
            len(lines),
            len([1 for p, ln in enumerate(lines, 1) if winners[ln] == (did, p)]),
        )
        for did, lines in split.items()
    }


def test_randomized_against_brute_force(spark):
    rng = random.Random(0x11DE)
    shared = [f"shared line {i}" for i in range(8)]
    docs = []
    for did in range(60):
        n = rng.randint(1, 8)
        lines = [
            rng.choice(shared) if rng.random() < 0.5 else f"novel {did} {j}"
            for j in range(n)
        ]
        docs.append((did, "\n".join(lines)))
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_kept"])
        for r in corpus.line_dedup(
            spark.createDataFrame(docs, ["doc_id", "text"])
        ).collect()
    }
    assert got == _spec(docs)


def test_unicode_cross_engine_parity(spark):
    """Non-ASCII lines hash and dedupe identically in both engines —
    Spark's md5 runs over the UTF-8 cast-to-binary bytes, DuckDB's over
    the VARCHAR's UTF-8 bytes, so the 60-bit line keys agree."""
    import duckdb

    rows = [
        (0, "café au lait\n日本語の行\nnaïve résumé"),
        (1, "café au lait\nunique ümläut line"),
        (2, "日本語の行\nemoji \U0001f600 line\nnaïve résumé"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(tuple(r) for r in corpus.line_dedup(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(corpus.line_dedup_sql(src="docs")).fetchall()
    )
    assert got == want
    assert dict((r[0], r[3]) for r in got) == {0: 3, 1: 1, 2: 1}


def test_null_and_empty_text_parity(spark):
    """NULL text propagates identically in both engines (n_lines NULL,
    clean_text '', n_kept 0) and empty text yields the 0-line row —
    the NULL rule is pinned so generic (non-fixture) corpora with
    missing text cannot silently diverge."""
    import duckdb
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    rows = [(0, "shared line\nunique a"), (1, None), (2, ""), (3, "shared line")]
    got = sorted(
        tuple(r)
        for r in corpus.line_dedup(spark.createDataFrame(rows, schema)).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(corpus.line_dedup_sql(src="docs")).fetchall()
    )
    assert got == want
    assert got[1] == (1, "", None, 0) and got[3] == (3, "", 1, 0)


def test_fixed_point_on_fixture(spark, sf_dir):
    """Re-running line_dedup on its own output changes nothing."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    once = corpus.line_dedup(corpus.line_fixture(docs)).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = corpus.line_dedup(once)
    assert twice.where(F.col("n_kept") != F.col("n_lines")).count() == 0
