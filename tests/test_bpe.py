"""BPE merge training: merge-sequence equality against a pure-Python
reference implementation (Sennrich-style greedy word-level BPE)."""

from __future__ import annotations

import collections

from pyspark.sql import Row

from log_formatter_spark.functions.bpe import EOW, segment_words, train_bpe


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    freq = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                freq[w] += 1
    vocab = {w: list(w) + [EOW] for w in freq}
    merges = []
    for _ in range(n_merges):
        counts: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freq[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), n = best
        if n < 2:
            break
        merges.append((left, right))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if out and out[-1] == left and syms[i] == right:
                    out[-1] = left + right
                else:
                    out.append(syms[i])
                i += 1
            # NOTE: the fold above merges against the already-merged
            # tail, exactly like the Spark aggregate() fold
            vocab[w] = out
    return merges


CORPUS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wider wide wide widest",
    "low new wide lower",
]


def test_bpe_merges_match_reference(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)]
    )
    got = train_bpe(docs, n_merges=12)
    want = _py_bpe(CORPUS, 12)
    assert got == want, (got, want)
    assert len(got) >= 8  # corpus supports a real merge sequence


def test_bpe_segmentation_replays_merges(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)]
    )
    merges = train_bpe(docs, n_merges=6)
    seg = {r["word"]: list(r["symbols"]) for r in segment_words(docs, merges).collect()}
    # every word's symbols concatenate back to word + EOW (lossless)
    for word, syms in seg.items():
        assert "".join(syms) == word + EOW
    # and at least one multi-char merged symbol exists
    assert any(len(s) > 1 and s != EOW for syms in seg.values() for s in syms)


def test_bpe_parallelism_invariant(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(CORPUS * 5)]
    )
    a = train_bpe(docs.repartition(1), n_merges=5)
    b = train_bpe(docs.repartition(16), n_merges=5)
    assert a == b
