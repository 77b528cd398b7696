"""Semantics of corpus.strip_boilerplate (the actionable rewrite form
of boilerplate_fraction): corpus-common n-gram spans vanish from every
document, novel prose survives verbatim (token-normalized), and
fully-boilerplate documents keep a row with empty clean_text instead of
disappearing. The contract replica proves Spark≡DuckDB; these pin the
operator's guarantees on engineered fixtures.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_formatter_spark.operators import corpus

BOILER = "all rights reserved worldwide"
N = 3
MIN_DF = 3


@pytest.fixture(scope="module")
def docs(spark):
    uniq = [
        "alpha bravo charlie delta echo foxtrot",
        "golf hotel india juliet kilo lima",
        "mike november oscar papa quebec romeo",
    ]
    rows = [(i, f"{BOILER} {t}") for i, t in enumerate(uniq)]
    # a fully-boilerplate doc: nothing but the shared blurb
    rows.append((len(uniq), BOILER))
    # one doc with NO hot shingles at all
    rows.append((len(uniq) + 1, "Sierra TANGO uniform victor whiskey"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def out(docs):
    return {
        r["doc_id"]: r
        for r in corpus.strip_boilerplate(docs, n=N, min_df=MIN_DF).collect()
    }


def test_row_per_input_doc(docs, out):
    assert set(out) == {r["doc_id"] for r in docs.collect()}


def test_boilerplate_vanishes_and_prose_survives(out):
    uniq = [
        "alpha bravo charlie delta echo foxtrot",
        "golf hotel india juliet kilo lima",
        "mike november oscar papa quebec romeo",
    ]
    for i, t in enumerate(uniq):
        assert out[i]["clean_text"] == t
        assert out[i]["n_kept"] == 6
        assert out[i]["n_tokens"] == 6 + len(BOILER.split())


def test_fully_boilerplate_doc_keeps_empty_row(out):
    r = out[3]
    assert r["clean_text"] == ""
    assert r["n_kept"] == 0
    assert r["n_tokens"] == len(BOILER.split())


def test_doc_without_hot_shingles_is_token_normalized_identity(out):
    # lowercased, single-spaced — the same canonicalization every
    # downstream dedup/quality operator applies
    assert out[4]["clean_text"] == "sierra tango uniform victor whiskey"
    assert out[4]["n_kept"] == out[4]["n_tokens"] == 5


def test_kept_count_equals_clean_text_tokens(out):
    for r in out.values():
        n = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert r["n_kept"] == n
        assert r["n_kept"] <= r["n_tokens"]


def test_zero_boiler_frac_docs_unchanged_on_fixture(spark, sf_dir):
    """Cross-consistency with boilerplate_fraction on the driver
    fixture: any doc whose boiler_frac is 0 must come back with every
    token kept."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frac = corpus.boilerplate_fraction(d).select("doc_id", "boiler_frac")
    stripped = corpus.strip_boilerplate(d)
    joined = stripped.join(frac, "doc_id").where(F.col("boiler_frac") == 0.0)
    bad = joined.where(F.col("n_kept") != F.col("n_tokens")).count()
    assert bad == 0
