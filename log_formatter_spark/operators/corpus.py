"""Composite corpus-cleaning operator — the end-to-end training-data
use-case: combine quality scoring, exact dedup, language ID and token
bounds into a per-document keep/drop decision with an audit reason.

The plan is a join of four per-doc derivations on doc_id. All four are
map-side-cheap over one shared scan at the storage layer (column
pruning keeps only (doc_id, text)), and doc_id joins co-partition
cleanly at any scale. The ``reason`` column is the first failing rule
in a fixed order — deterministic and auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from log_formatter_spark.functions.text import (
    lang_id,
    lang_id_sql,
    text_stats,
    text_stats_sql,
    token_count,
    token_count_sql,
)
from log_formatter_spark.operators.dedup import exact_dedup, exact_dedup_sql

MIN_QUALITY = 0.5
MIN_TOKENS = 20
MAX_TOKENS = 10_000
KEEP_LANGS = ("en", "und")


def corpus_filter(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, keep, reason, quality_score, lang_pred, n_bpe_tokens)."""
    stats = text_stats(df).select(id_col, "quality_score")
    dups = exact_dedup(df).select(id_col, "is_dup")
    langs = lang_id(df).select(id_col, "lang_pred")
    toks = token_count(df).select(id_col, "n_bpe_tokens")
    j = stats.join(dups, id_col).join(langs, id_col).join(toks, id_col)
    lang_ok = F.col("lang_pred").isin(*KEEP_LANGS)
    reason = (
        F.when(F.col("is_dup"), "duplicate")
        .when(~lang_ok, "language")
        .when(F.col("n_bpe_tokens") < MIN_TOKENS, "too_short")
        .when(F.col("n_bpe_tokens") > MAX_TOKENS, "too_long")
        .when(F.col("quality_score") < MIN_QUALITY, "low_quality")
        .otherwise("kept")
    )
    return j.select(
        id_col,
        (reason == "kept").alias("keep"),
        reason.alias("reason"),
        "quality_score",
        "lang_pred",
        "n_bpe_tokens",
    )


def corpus_filter_sql(src: str = "documents", id_col: str = "doc_id") -> str:
    langs = ", ".join(f"'{l}'" for l in KEEP_LANGS)
    return f"""
WITH stats AS ({text_stats_sql(src)}),
dups AS ({exact_dedup_sql(src)}),
langs AS ({lang_id_sql(src)}),
toks AS ({token_count_sql(src)}),
j AS (
  SELECT stats.{id_col}, stats.quality_score, dups.is_dup, langs.lang_pred,
         toks.n_bpe_tokens
  FROM stats
  JOIN dups USING ({id_col})
  JOIN langs USING ({id_col})
  JOIN toks USING ({id_col})
),
decided AS (
  SELECT *, CASE
    WHEN is_dup THEN 'duplicate'
    WHEN lang_pred NOT IN ({langs}) THEN 'language'
    WHEN n_bpe_tokens < {MIN_TOKENS} THEN 'too_short'
    WHEN n_bpe_tokens > {MAX_TOKENS} THEN 'too_long'
    WHEN quality_score < {MIN_QUALITY} THEN 'low_quality'
    ELSE 'kept' END AS reason
  FROM j
)
SELECT {id_col}, reason = 'kept' AS keep, reason, quality_score, lang_pred,
       n_bpe_tokens
FROM decided
"""
