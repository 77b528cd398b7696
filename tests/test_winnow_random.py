"""Randomized winnowing spec test against a brute-force Python oracle
(independent of the DuckDB rendering): positional shingle hashes,
rolling w-window minima over valid starts, distinct selected values."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import Row

from log_formatter_spark.functions.shingles import winnow

N, W = 3, 4


def _md5_60(s: str) -> int:
    # functions.hashing.md5_60 semantics: first 15 hex chars as int
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute_winnow(text: str) -> set[int]:
    toks = text.split()
    if len(toks) < N:
        return set()
    hashes = [
        _md5_60(" ".join(toks[i : i + N])) for i in range(len(toks) - N + 1)
    ]
    n_sh = len(hashes)
    starts = range(max(1, n_sh - (W - 1)))
    return {min(hashes[i : i + W]) for i in starts}


def test_winnow_matches_bruteforce(spark):
    rng = random.Random(20240817)
    vocab = [f"w{j}" for j in range(12)]  # small vocab -> repeated shingles
    docs = [
        Row(doc_id=i, text=" ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25))))
        for i in range(60)
    ]
    out = winnow(spark.createDataFrame(docs, "doc_id long, text string"), n=N, w=W)
    got: dict[int, set[int]] = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for d in docs:
        want = _brute_winnow(d.text)
        assert got.get(d.doc_id, set()) == want, (d.doc_id, d.text)
