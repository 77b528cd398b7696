"""Word n-gram shingling — the shared substrate for minhash / Jaccard
dedup and document fingerprinting.

Both engines build the same (doc_id, shingle) set:
  Spark : explode(sequence(1, size(toks)-n+1)) + element_at slices
  DuckDB: lateral range(1, len(toks)-n+2) + 1-based list indexing

The shingle table is the scale-critical intermediate: at 10^12 docs it
is ~#tokens rows wide but only two columns, feeds straight into hash
aggregations (min-hash) or a shingle-keyed self-join (Jaccard), and
never materializes the original text past the first projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from log_formatter_spark.functions.hashing import md5_60, MD5_60_SQL
from log_formatter_spark.functions.text import tokens, TOKENS_SQL


def shingle_df(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    distinct: bool = True,
) -> DataFrame:
    """Word n-gram shingles per document (a set when ``distinct=True``).

    ``distinct=False`` skips the dedup — and with it a full-width
    shuffle of the (id, shingle) table. Correct whenever the consumer is
    duplicate-idempotent: min-hash signatures use it (min over a
    multiset == min over its set), which leaves the signature plan with
    a single exchange that carries only (id, 16 longs) partials.
    Set-semantics consumers (Jaccard counts, fingerprint cardinality)
    must keep the default."""
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("toks")).where(
        F.size("toks") >= n
    )
    idx = base.select(
        id_col,
        "toks",
        F.explode(F.sequence(F.lit(1), F.size("toks") - (n - 1))).alias("i"),
    )
    parts = [F.element_at(F.col("toks"), F.col("i") + F.lit(k)) for k in range(n)]
    out = idx.select(id_col, F.concat_ws(" ", *parts).alias("shingle"))
    return out.distinct() if distinct else out


def shingles_sql(
    src: str = "documents", n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    toks = TOKENS_SQL.format(x=text_col)
    parts = " || ' ' || ".join(f"toks[i + {k}]" for k in range(n))
    return f"""
SELECT DISTINCT {id_col}, shingle FROM (
  SELECT {id_col},
         unnest(list_transform(generate_series(1, len(toks) - {n - 1}), i -> {parts})) AS shingle
  FROM (SELECT {id_col}, {toks} AS toks FROM {src}) _t
)
"""


def fingerprint(
    df: DataFrame, n: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rolling-hash document fingerprint: bottom sketch of shingle hashes.

    min/max of the 60-bit shingle hashes + distinct-shingle count. min
    and max are order-independent aggregates — deterministic at any
    parallelism, and the shuffle carries only (doc_id, 3 longs).
    """
    sh = shingle_df(df, n=n, text_col=text_col, id_col=id_col)
    h = md5_60(F.col("shingle"))
    return sh.groupBy(id_col).agg(
        F.min(h).alias("fp_min"),
        F.max(h).alias("fp_max"),
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
    )


def fingerprint_sql(
    src: str = "documents", n: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    h = MD5_60_SQL.format(x="shingle")
    return f"""
WITH sh AS ({shingles_sql(src, n=n, text_col=text_col, id_col=id_col)})
SELECT {id_col}, min({h}) AS fp_min, max({h}) AS fp_max,
       CAST(count(*) AS BIGINT) AS n_shingles
FROM sh GROUP BY {id_col}
"""
