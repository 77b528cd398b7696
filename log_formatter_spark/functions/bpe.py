"""BPE (byte-pair-encoding) merge training — tokenizer training as a
Spark job.

Classic Sennrich-style word-level BPE: represent every distinct word as
a symbol sequence (characters + an end-of-word marker), then repeatedly
(1) count adjacent symbol pairs weighted by word frequency and
(2) merge the globally most frequent pair everywhere. The merge list IS
the tokenizer.

Spark-first shape — the same iterative pattern as dedup.cluster_pairs:

- The working state is the (word, freq, symbols) table, which is the
  DISTINCT-WORD table — at 100 TB the corpus collapses to a vocabulary
  of ~10^7-10^8 rows after the first aggregation, so every subsequent
  iteration runs over vocabulary-sized data regardless of corpus size.
- Pair counting is explode + groupBy(sum) — map-side combinable; the
  argmax is an orderBy(count desc, pair asc).limit(1) collect
  (TakeOrderedAndProject: one driver-sized row per iteration, the
  canonical iterate-until-fixpoint control signal).
- The merge itself is a higher-order ``aggregate`` fold over each
  symbol array — left-to-right, non-overlapping, exactly the greedy
  semantics of the reference Python implementation
  (tests/test_bpe.py proves merge-sequence equality).
- ``localCheckpoint`` per iteration keeps plan size constant;
  superseded state is reclaimed by the ContextCleaner.

No SQL oracle: per-iteration argmax + rewrite is genuinely iterative
(same class as connected components, which got a recursive-CTE oracle
only because reachability happens to be monotone); equivalence evidence
is the pure-Python reference instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from log_formatter_spark.functions.text import tokens

EOW = "</w>"


def _word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, symbols): distinct words with corpus frequencies and
    their initial character+EOW symbol sequences."""
    words = docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    symbols = F.concat(
        F.transform(F.split(F.col("word"), ""), lambda c: c),
        F.array(F.lit(EOW)),
    )
    # split("", "") yields a trailing empty string on some engines; drop
    symbols = F.filter(symbols, lambda s: s != F.lit(""))
    return freq.select("word", "freq", symbols.alias("symbols"))


def _pair_counts(state: DataFrame) -> DataFrame:
    # fully-merged single-symbol words have no pairs (and sequence(1, 0)
    # would DESCEND, producing out-of-range indices)
    state = state.where(F.size("symbols") >= 2)
    pairs = state.select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("symbols") - 1),
                lambda i: F.struct(
                    F.element_at("symbols", i).alias("left"),
                    F.element_at("symbols", i + 1).alias("right"),
                ),
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("n"))
    )


def _merge_expr(left: str, right: str):
    """Left-to-right non-overlapping merge of (left, right) in a symbol
    array, as one aggregate fold: append each symbol, but when the
    accumulator ends in ``left`` and the next symbol is ``right``,
    replace the tail with the merged symbol."""
    lit_l, lit_r = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    return F.aggregate(
        F.col("symbols"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lit_l)
            & (s == lit_r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    list in training order. Ties on pair count break by (left, right)
    lexicographic — fully deterministic at any parallelism."""
    state = _word_table(docs, text_col=text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(state)
            .orderBy(F.col("n").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        left, right = top[0]["left"], top[0]["right"]
        merges.append((left, right))
        state = state.select(
            "word", "freq", _merge_expr(left, right).alias("symbols")
        ).localCheckpoint(eager=True)
    return merges


def segment_words(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Apply a trained merge list: (word, freq, symbols) with every merge
    replayed in training order — the vocabulary table a tokenizer ships."""
    state = _word_table(docs, text_col=text_col)
    for left, right in merges:
        state = state.select("word", "freq", _merge_expr(left, right).alias("symbols"))
    return state
