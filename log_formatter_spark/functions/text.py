"""Text-analysis functions for the training-data pipeline layer.

Whitespace tokenization, quality scoring, BPE-ish token counting and a
stopword-profile language heuristic — each as JVM-side column
expressions (whole-stage codegen, no Python) with a lockstep DuckDB SQL
rendering for the driver's oracle.

Design constraint: every formula uses only +, -, *, /, abs, least,
greatest and integer counts — no transcendentals — so Spark and DuckDB
produce bit-identical doubles (IEEE ops on identical inputs) and the
driver's value-hash comparison passes exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- tokenization ---------------------------------------------------------


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(col), " "), lambda t: t != F.lit(""))


# DuckDB rendering; format with x = string SQL expression.
TOKENS_SQL = "list_filter(string_split(lower({x}), ' '), t -> t <> '')"

# BPE-ish word/number/punct tokenizer (applied to lowercased text).
# RE2-compatible so Java regex (Spark) and RE2 (DuckDB) agree.
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# --- stopword profiles ----------------------------------------------------

STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "is", "and"),
    "fr": ("le", "la", "les", "de", "et", "un"),
    "de": ("der", "die", "und", "das", "ein", "ist"),
    "es": ("el", "los", "las", "de", "y", "una"),
}


def _stop_hits(toks: Column, words: tuple[str, ...]) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))


def _stop_hits_sql(toks: str, words: tuple[str, ...]) -> str:
    wl = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"CAST(len(list_filter({toks}, t -> list_contains({wl}, t))) AS INTEGER)"


# --- text_stats -----------------------------------------------------------


def tok_chars_expr(toks: Column) -> Column:
    """Total characters across tokens (sequential int fold)."""
    return F.aggregate(F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x)


def quality_expr(n_tokens: Column, tok_chars: Column, n_stop: Column) -> Column:
    """The rational-arithmetic quality score.

    Shared by text_stats and the single-pass corpus_filter so both
    produce bit-identical doubles (same ops, same order, same inputs)."""
    avg_tok = tok_chars / n_tokens
    stop_ratio = n_stop / n_tokens
    len_term = F.greatest(F.lit(0.0), F.lit(1.0) - F.abs(avg_tok - F.lit(5.0)) / F.lit(5.0))
    size_term = F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    return (
        F.lit(0.4) * size_term
        + F.lit(0.3) * len_term
        + F.lit(0.3) * F.least(F.lit(1.0), stop_ratio * F.lit(4.0))
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats + a rational-arithmetic quality score.

    All expressions are codegen'd JVM scalar ops over one scan — at
    100 TB this is a map-only stage with zero shuffles.
    """
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.length(text_col).cast("int").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        tok_chars_expr(toks).alias("_tok_chars"),
        _stop_hits(toks, STOPWORDS).alias("n_stop"),
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]"), F.lit(0))).alias(
            "_n_alpha"
        ),
    )
    avg_tok = F.col("_tok_chars") / F.col("n_tokens")
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    alpha_ratio = F.col("_n_alpha") / F.col("n_chars")
    return base.select(
        id_col,
        "n_chars",
        "n_tokens",
        "n_types",
        avg_tok.alias("avg_token_len"),
        stop_ratio.alias("stop_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        quality_expr(F.col("n_tokens"), F.col("_tok_chars"), F.col("n_stop")).alias(
            "quality_score"
        ),
    )


def text_stats_sql(src: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    toks = TOKENS_SQL.format(x=text_col)
    return f"""
WITH base AS (
  SELECT {id_col},
         CAST(length({text_col}) AS INTEGER) AS n_chars,
         CAST(len({toks}) AS INTEGER) AS n_tokens,
         CAST(len(list_distinct({toks})) AS INTEGER) AS n_types,
         CAST(list_reduce(list_prepend(0, list_transform({toks}, t -> CAST(length(t) AS INTEGER))), (a, b) -> a + b) AS INTEGER) AS _tok_chars,
         {_stop_hits_sql(toks, STOPWORDS)} AS n_stop,
         CAST(len(regexp_extract_all(lower({text_col}), '[a-z]', 0)) AS INTEGER) AS _n_alpha
  FROM {src}
)
SELECT {id_col}, n_chars, n_tokens, n_types,
       _tok_chars / n_tokens AS avg_token_len,
       n_stop / n_tokens AS stop_ratio,
       _n_alpha / n_chars AS alpha_ratio,
       0.4 * least(1.0, n_tokens / 100.0)
     + 0.3 * greatest(0.0, 1.0 - abs(_tok_chars / n_tokens - 5.0) / 5.0)
     + 0.3 * least(1.0, (n_stop / n_tokens) * 4.0) AS quality_score
FROM base
"""


# --- token_count ----------------------------------------------------------


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    return df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_TOKEN_RE), F.lit(0))
        ).alias("n_bpe_tokens"),
    )


def token_count_sql(src: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    toks = TOKENS_SQL.format(x=text_col)
    return f"""
SELECT {id_col},
       CAST(len({toks}) AS INTEGER) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower({text_col}), '{BPE_TOKEN_RE}', 0)) AS INTEGER) AS n_bpe_tokens
FROM {src}
"""


# --- lang_id --------------------------------------------------------------

_LANG_ORDER = ("en", "fr", "de", "es")
_MIN_SCORE = 0.05


# --- character-trigram profiles (the n-gram language heuristic) -----------
#
# Fixed top character trigrams per language (space-padded function-word
# boundaries — ' th', 'he ', 'de ', etc. are the classic discriminators
# from the n-gram LID literature, Cavnar & Trenkle-style). Deterministic
# constants so Spark and the DuckDB oracle score identically.
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", " of", "of ", " an", "and", "nd ", " is", "is "),
    "fr": (" le", "le ", " de", "de ", " la", "la ", "es ", " et", "et ", " un"),
    "de": (" de", "der", "er ", " di", "die", "ie ", " un", "und", "nd ", "ch "),
    "es": (" de", "de ", " la", "la ", " el", "el ", "os ", " y ", "as ", " en"),
}


def char_trigrams(col: Column) -> Column:
    """All character trigrams of the lowercased, space-padded text (a
    codegen'd array expression — map-only, no Python, no explode)."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(padded) - F.lit(2), F.lit(0))),
        lambda i: padded.substr(i, F.lit(3)),
    )


CHAR_TRIGRAMS_SQL = (
    "list_transform(generate_series(1, greatest(length(' ' || lower({x}) || ' ') - 2, 0)),"
    " i -> substr(' ' || lower({x}) || ' ', i, 3))"
)


def lang_pred_expr(scores: dict[str, Column]) -> Column:
    """Argmax over per-language scores with fixed tie order (earlier in
    _LANG_ORDER wins ties); all below threshold → 'und'. Shared by
    lang_id and the single-pass corpus_filter for bit-identical output."""
    pred = F.lit("und")
    for lang in reversed(_LANG_ORDER):
        cond = scores[lang] >= F.lit(_MIN_SCORE)
        for o in _LANG_ORDER:
            if o == lang:
                continue
            # priority: an earlier lang wins ties, later must be strictly greater
            if _LANG_ORDER.index(o) < _LANG_ORDER.index(lang):
                cond = cond & (scores[lang] > scores[o])
            else:
                cond = cond & (scores[lang] >= scores[o])
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return pred


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language heuristic.

    Honest n-gram/function-word scoring: the driver's synthetic ``lang``
    column is decorative (same vocabulary for every label), so the
    contract here is determinism + cross-engine equality, not recovering
    the label. Argmax with fixed tie order; all-below-threshold → 'und'.
    """
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("_n"),
        *[
            _stop_hits(toks, LANG_STOPWORDS[lang]).alias(f"_h_{lang}")
            for lang in _LANG_ORDER
        ],
    )
    scores = {lang: F.col(f"_h_{lang}") / F.col("_n") for lang in _LANG_ORDER}
    return base.select(
        id_col,
        lang_pred_expr(scores).alias("lang_pred"),
        *[scores[lang].alias(f"{lang}_score") for lang in _LANG_ORDER],
    )


def lang_id_ngram(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Character-trigram language heuristic (Cavnar–Trenkle-style
    profile intersection) — the n-gram sibling of the stopword-profile
    ``lang_id``. Score per language = fraction of the document's
    trigram OCCURRENCES that appear in that language's fixed profile;
    argmax with the same deterministic tie order. Entirely codegen'd
    array expressions over one scan — map-only at any scale."""
    trigs = char_trigrams(F.col(text_col))

    def _hits(lang: str) -> Column:
        prof = F.array(*[F.lit(g) for g in LANG_TRIGRAMS[lang]])
        return F.size(F.filter(trigs, lambda t: F.array_contains(prof, t)))

    base = df.select(
        F.col(id_col),
        F.greatest(F.size(trigs), F.lit(1)).alias("_n3"),
        *[_hits(lang).alias(f"_g_{lang}") for lang in _LANG_ORDER],
    )
    scores = {lang: F.col(f"_g_{lang}") / F.col("_n3") for lang in _LANG_ORDER}
    return base.select(
        id_col,
        lang_pred_expr(scores).alias("lang_pred"),
        *[scores[lang].alias(f"{lang}_score") for lang in _LANG_ORDER],
    )


def lang_id_ngram_sql(
    src: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    trigs = CHAR_TRIGRAMS_SQL.format(x=text_col)
    hits = ",\n         ".join(
        "CAST(len(list_filter(trigs, t -> list_contains(["
        + ", ".join("'" + g.replace("'", "''") + "'" for g in LANG_TRIGRAMS[lang])
        + f"], t))) AS INTEGER) AS _g_{lang}"
        for lang in _LANG_ORDER
    )
    score = {lang: f"(_g_{lang} / _n3)" for lang in _LANG_ORDER}
    whens = []
    for lang in _LANG_ORDER:
        conds = [f"{score[lang]} >= {_MIN_SCORE}"]
        for o in _LANG_ORDER:
            if o == lang:
                continue
            op = ">" if _LANG_ORDER.index(o) < _LANG_ORDER.index(lang) else ">="
            conds.append(f"{score[lang]} {op} {score[o]}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + " ELSE 'und' END"
    sel_scores = ", ".join(f"{score[lang]} AS {lang}_score" for lang in _LANG_ORDER)
    return f"""
WITH base AS (
  SELECT {id_col},
         greatest(CAST(len(trigs) AS INTEGER), 1) AS _n3,
         {hits}
  FROM (SELECT {id_col}, {trigs} AS trigs FROM {src})
)
SELECT {id_col}, {case} AS lang_pred, {sel_scores}
FROM base
"""


def lang_id_sql(src: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    toks = TOKENS_SQL.format(x=text_col)
    hits = ",\n         ".join(
        f"{_stop_hits_sql(toks, LANG_STOPWORDS[lang])} AS _h_{lang}" for lang in _LANG_ORDER
    )
    score = {lang: f"(_h_{lang} / _n)" for lang in _LANG_ORDER}
    whens = []
    for lang in _LANG_ORDER:
        conds = [f"{score[lang]} >= {_MIN_SCORE}"]
        for o in _LANG_ORDER:
            if o == lang:
                continue
            op = ">" if _LANG_ORDER.index(o) < _LANG_ORDER.index(lang) else ">="
            conds.append(f"{score[lang]} {op} {score[o]}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + " ELSE 'und' END"
    sel_scores = ", ".join(f"{score[lang]} AS {lang}_score" for lang in _LANG_ORDER)
    return f"""
WITH base AS (
  SELECT {id_col}, CAST(len({toks}) AS INTEGER) AS _n,
         {hits}
  FROM {src}
)
SELECT {id_col}, {case} AS lang_pred, {sel_scores}
FROM base
"""
