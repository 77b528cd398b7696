"""Boundary-exact semantics of corpus.gopher_rules: every published
Gopher rule decision is an integer comparison, so documents sitting
EXACTLY on a threshold (mean word length 3.0, symbol ratio 0.1, 80%
alphabetic, 90% bullet lines, 30% ellipsis lines) pass in both engines
identically. Each case isolates one rule; a DuckDB parity check runs
the same rows through the SQL twin."""

from __future__ import annotations

import duckdb
import pytest

from log_formatter_spark.operators import corpus

FILLER = "word"  # 4 chars, alphabetic, not a required stopword


def _doc(words):
    return " ".join(words)


CASES = {
    # (text, flag_name, expected)
    "pass_all": (
        _doc(["the", "and"] + [FILLER] * 48),
        "pass_gopher",
        True,
    ),
    "word_count_low": (_doc(["the", "and"] + [FILLER] * 47), "ok_word_count", False),
    "word_count_boundary": (_doc(["the", "and"] + [FILLER] * 48), "ok_word_count", True),
    # 50 words x 3 chars: total 150 == 3*50 — the inclusive lower bound
    "mean_len_boundary_low": (_doc(["the", "and"] + ["abc"] * 48), "ok_mean_word_len", True),
    # 50 words x 11 chars: 550 > 10*50
    "mean_len_high": (_doc(["lengthiness"] * 50), "ok_mean_word_len", False),
    # 5 symbols among 50 words: 10*5 == 50 — boundary passes
    "symbol_boundary": (
        _doc(["the", "and"] + [FILLER] * 47 + ["x#####"]),
        "ok_symbol_ratio",
        True,
    ),
    "symbol_over": (
        _doc(["the", "and"] + [FILLER] * 47 + ["x######"]),
        "ok_symbol_ratio",
        False,
    ),
    # 40 alphabetic of 50: 10*40 == 8*50 — boundary passes
    "alpha_boundary": (
        _doc(["the", "and"] + [FILLER] * 38 + ["123"] * 10),
        "ok_alpha_words",
        True,
    ),
    "alpha_under": (
        _doc(["the", "and"] + [FILLER] * 37 + ["123"] * 11),
        "ok_alpha_words",
        False,
    ),
    # repeats of ONE required stopword do not reach 2 distinct
    "stopwords_repeat": (_doc(["the"] * 3 + [FILLER] * 47), "ok_stopwords", False),
    "stopwords_two_distinct": (_doc(["the", "of"] + [FILLER] * 48), "ok_stopwords", True),
    # 9 bullet lines of 10: 10*9 == 9*10 — boundary passes
    "bullet_boundary": (
        "\n".join(["- item", "• item", "* item"] * 3 + ["prose line"]),
        "ok_bullet_lines",
        True,
    ),
    "bullet_all": (
        "\n".join(["- item"] * 10),
        "ok_bullet_lines",
        False,
    ),
    # 3 ellipsis-ended lines of 10: 10*3 == 3*10 — boundary passes
    "ellipsis_boundary": (
        "\n".join(["trails off…", "or this...", "also this…"] + ["prose"] * 7),
        "ok_ellipsis_lines",
        True,
    ),
    "ellipsis_over": (
        "\n".join(["trails off…", "or this...", "also…", "more…"] + ["prose"] * 6),
        "ok_ellipsis_lines",
        False,
    ),
}


@pytest.fixture(scope="module")
def flags(spark):
    rows = [(i, text) for i, (text, _, _) in enumerate(CASES.values())]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in corpus.gopher_rules(df).collect()}
    return rows, out


@pytest.mark.parametrize("name", CASES)
def test_rule_boundary(flags, name):
    _, out = flags
    idx = list(CASES).index(name)
    _, flag, expected = CASES[name]
    assert out[idx][flag] is expected, (name, out[idx])


def test_duckdb_parity(flags):
    rows, out = flags
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    res = con.execute(corpus.gopher_rules_sql(src="docs")).fetchall()
    cols = [d[0] for d in con.description]
    want = {r[0]: dict(zip(cols, r)) for r in res}
    assert {k: dict(v) for k, v in out.items()} == want


def test_pass_is_conjunction(flags):
    _, out = flags
    for r in out.values():
        expected = all(v for k, v in r.items() if k.startswith("ok_"))
        assert r["pass_gopher"] is expected
