"""Randomized spec tests for the round-3c curation operators against
brute-force pure-Python oracles (independent of the DuckDB renderings
already checked in tests/test_contract.py): decontaminate,
boilerplate_fraction, conv_dedup, conv_qa."""

from __future__ import annotations

import datetime as dt
import random
import re

from pyspark.sql import Row
from pyspark.sql import functions as F

from log_formatter_spark.operators.conversations import conv_dedup, conv_qa
from log_formatter_spark.operators.corpus import boilerplate_fraction, decontaminate


def _shingles(text: str, n: int) -> set[str]:
    toks = [t for t in text.lower().split(" ") if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _random_docs(rng: random.Random, n_docs: int = 80, vocab_size: int = 10):
    vocab = [f"w{j}" for j in range(vocab_size)]  # tiny vocab -> real overlap
    return [
        Row(
            doc_id=i,
            text=" ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 15))),
        )
        for i in range(n_docs)
    ]


def test_decontaminate_matches_bruteforce(spark):
    rng = random.Random(20260817)
    rows = _random_docs(rng)
    n = 3
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    eval_ids = {r.doc_id for r in rows if r.doc_id % 7 == 0}
    eval_sh: set[str] = set()
    for r in rows:
        if r.doc_id in eval_ids:
            eval_sh |= _shingles(r.text, n)
    expect = {}
    for r in rows:
        if r.doc_id in eval_ids:
            continue
        hits = len(_shingles(r.text, n) & eval_sh)
        if hits:
            expect[r.doc_id] = hits
    got = {
        r["doc_id"]: r["n_hit_shingles"]
        for r in decontaminate(docs, eval_pred=F.col("doc_id") % 7 == 0, n=n).collect()
    }
    assert got == expect and expect  # non-vacuous


def test_boilerplate_fraction_matches_bruteforce(spark):
    rng = random.Random(1234)
    rows = _random_docs(rng)
    n, min_df = 3, 3
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    per_doc = {r.doc_id: _shingles(r.text, n) for r in rows}
    df_count: dict[str, int] = {}
    for sh in per_doc.values():
        for s in sh:
            df_count[s] = df_count.get(s, 0) + 1
    expect = {}
    for did, sh in per_doc.items():
        if not sh:
            continue  # docs shorter than n produce no row
        boiler = sum(1 for s in sh if df_count[s] >= min_df)
        expect[did] = (len(sh), boiler, boiler / len(sh))
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_boiler"], r["boiler_frac"])
        for r in boilerplate_fraction(docs, n=n, min_df=min_df).collect()
    }
    assert got == expect
    assert any(v[1] > 0 for v in expect.values())  # non-vacuous


def _random_turns(rng: random.Random, n_convs: int = 25):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for c in range(n_convs):
        # only 4 possible 2-turn scripts -> guaranteed prefix collisions
        script = rng.randrange(4)
        n_turns = rng.randrange(2, 6)
        for i in range(n_turns):
            word = f"s{script}" if i < 2 else rng.choice(["x", "y", "z"])
            rows.append(
                Row(
                    conv_id=f"c{c:03d}",
                    turn_idx=i,
                    role=rng.choice(["user", "assistant"]),
                    text=f"{word} ok" if rng.random() > 0.2 else "bad!",
                    ts=base + dt.timedelta(seconds=c * 1000 + i, microseconds=rng.randrange(1000)),
                )
            )
    return rows


def test_conv_dedup_prefix_matches_bruteforce(spark):
    rng = random.Random(99)
    rows = _random_turns(rng)
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp_ntz"
    )
    k = 2
    by_conv: dict[str, list] = {}
    for r in rows:
        if r.turn_idx < k:
            by_conv.setdefault(r.conv_id, []).append(r)
    groups: dict[str, list[str]] = {}
    for cid, turns in by_conv.items():
        key = "\n".join(x.text for x in sorted(turns, key=lambda x: x.turn_idx))
        groups.setdefault(key, []).append(cid)
    expect = sorted(
        (len(cids), min(cids), sum(len(by_conv[c]) for c in cids))
        for cids in groups.values()
    )
    got = sorted(
        (r["n_convs"], r["survivor_conv_id"], r["total_turns"])
        for r in conv_dedup(t, prefix_turns=k).collect()
    )
    assert got == expect
    assert any(g[0] > 1 for g in got)  # collisions actually happened


def test_conv_qa_matches_bruteforce(spark):
    rng = random.Random(7)
    rows = _random_turns(rng)
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp_ntz"
    )
    pat = re.compile(r"(?P<word>\w+) ok")
    expect = {}
    for cid in {r.conv_id for r in rows}:
        turns = sorted((r for r in rows if r.conv_id == cid), key=lambda x: x.turn_idx)
        malformed = sum(1 for r in turns if not pat.search(r.text))
        repeats = sum(
            1 for a, b in zip(turns, turns[1:]) if a.role == b.role
        )
        delta = max(r.ts for r in turns) - min(r.ts for r in turns)
        span = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        expect[cid] = (
            len(turns),
            malformed,
            repeats,
            len({r.role for r in turns}),
            span,
        )
    got = {
        r["conv_id"]: (
            r["n_turns"],
            r["n_malformed"],
            r["n_role_repeats"],
            r["n_roles"],
            r["span_us"],
        )
        for r in conv_qa(t, r"(?P<word>\w+) ok").collect()
    }
    assert got == expect
