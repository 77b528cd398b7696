"""PII redaction — training-corpus scrubbing as pure codegen expressions.

A pre-training pipeline must strip emails / IPs / phone-shaped strings
before anything else touches the text. Everything here is chained
``regexp_replace`` / ``regexp_extract_all`` on JVM built-ins: no UDFs,
whole-stage codegen end-to-end, trivially linear at 100 TB (map-only,
no exchange — the scan is the only stage).

Engine-parity constraints (the DuckDB oracle runs the SAME patterns):

- Patterns are RE2-safe AND Java-regex-safe: no backrefs, no
  lookaround, ASCII classes only, and no single quotes (they embed in
  SQL string literals).
- Replacements are literal tokens (``<EMAIL>``) — ``$1``-style group
  references have different syntax between Java and RE2, so they are
  banned here.
- Rules apply in a fixed order (specific → general) so both engines
  see identical intermediate strings; counts are measured on the
  ORIGINAL text, before any replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters and is part of the
# operator contract: emails first (an email contains digits/dots that
# the looser rules would mangle), then IPs, then phone shapes.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[a-zA-Z0-9_.+-]+@[0-9A-Za-z][0-9A-Za-z-]*(?:\.[0-9A-Za-z][0-9A-Za-z-]*)+",
        "<EMAIL>",
    ),
    (
        "ip",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\+\d{1,2} \(\d{3}\) \d{3}-\d{4}",
        "<PHONE>",
    ),
)


def redact_expr(col: Column) -> Column:
    """Chained literal-replacement redaction of ``col``."""
    out = col
    for _name, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document scrubbed text + per-rule hit counts.

    Counts come from ``size(regexp_extract_all(...))`` over the original
    text (cast to long: DuckDB ``len(list)`` is BIGINT), so the output
    doubles as a corpus PII profile — aggregate the ``n_*`` columns for
    the dataset card, keep ``clean_text`` for the training shard.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _repl in PII_RULES
    ]
    return df.select(
        F.col(id_col).alias("doc_id"),
        redact_expr(F.col(text_col)).alias("clean_text"),
        *counts,
    )


def redact_text_sql(
    src: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB rendering of :func:`redact_text` (same patterns, same order)."""
    clean = text_col
    for _name, pat, repl in PII_RULES:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all({text_col}, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _repl in PII_RULES
    )
    return f"""
SELECT {id_col} AS doc_id,
       {clean} AS clean_text,
       {counts}
FROM {src}
"""
