"""Hashed linear text classifier — fastText-shaped quality inference.

The fastText / CCNet quality-classifier step every production corpus
pipeline runs: score each document with a linear model over hashed
bag-of-words features ("the hashing trick": token → bucket via a hash,
weight per bucket, score = Σ weights). What makes this a *Spark* problem
is the inference plan, not the weights:

- feature hashing + weight lookup + accumulation are ONE map-only
  projection over the text scan — a higher-order ``aggregate`` fold over
  the token array, so a corpus-sized scoring pass has ZERO exchanges and
  never materializes a (doc, token) table;
- a trained model drops in as ``F.element_at(F.lit(weights), bucket+1)``
  (a literal/broadcast array lookup, still codegen) in place of the
  hash-derived weight used here.

The weights in this module are a deterministic stand-in — each bucket's
weight is a small signed integer derived from md5 of the bucket id — so
the operator has a bit-exact DuckDB oracle (integer sums are order-free;
no trained-float reproducibility question). That makes the *plumbing*
(hashing, bucketing, fold, margin, threshold decision) verifiable
end-to-end, which is the part that survives a model swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from log_formatter_spark.functions.hashing import MD5_60_SQL, md5_60
from log_formatter_spark.functions.text import TOKENS_SQL, tokens

N_BUCKETS = 256
# weight(bucket) = md5_60("w:" || bucket) % 17 - 8  ∈ [-8, 8]
_W_SPAN = 17
_W_SHIFT = 8


def _bucket(tok: Column) -> Column:
    return md5_60(tok) % F.lit(N_BUCKETS)


def _weight(tok: Column) -> Column:
    h = md5_60(F.concat(F.lit("w:"), _bucket(tok).cast("string")))
    return h % F.lit(_W_SPAN) - F.lit(_W_SHIFT)


def hashed_margin(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, margin, mean_margin, pred): linear margin of
    the hashed bag-of-words model, with multiplicity (a token scores
    once per occurrence, exactly fastText's sum-of-input-vectors with
    dim=1). ``mean_margin`` is one IEEE division (length-normalized
    score, fastText's default); ``pred`` thresholds the margin at 0.

    Map-only: the fold runs inside the projection, so scoring 10^12
    docs is a scan — no shuffle, no join, no Python. NULL text scores
    as empty (coalesce) — Spark's legacy size(NULL) = -1 would
    otherwise diverge from DuckDB's len(NULL) = NULL."""
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    margin = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + _weight(t),
    )
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        margin.alias("margin"),
    )
    return base.select(
        id_col,
        "n_tokens",
        "margin",
        F.when(
            F.col("n_tokens") > 0,
            F.col("margin").cast("double") / F.col("n_tokens").cast("double"),
        ).alias("mean_margin"),
        (F.col("margin") > 0).alias("pred"),
    )


def hashed_margin_sql(
    src: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    toks = TOKENS_SQL.format(x=f"COALESCE({text_col}, '')")
    bucket = f"({MD5_60_SQL.format(x='t')} % {N_BUCKETS})"
    weight = (
        MD5_60_SQL.format(x=f"'w:' || CAST({bucket} AS VARCHAR)")
        + f" % {_W_SPAN} - {_W_SHIFT}"
    )
    return f"""
SELECT {id_col}, n_tokens, margin,
       CASE WHEN n_tokens > 0
            THEN CAST(margin AS DOUBLE) / CAST(n_tokens AS DOUBLE) END AS mean_margin,
       margin > 0 AS pred
FROM (
  SELECT {id_col},
         CAST(len({toks}) AS INTEGER) AS n_tokens,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform({toks}, t -> {weight})), (a, b) -> a + b) AS margin
  FROM {src}
)
"""
