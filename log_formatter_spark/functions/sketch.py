"""KMV (k-minimum-values) distinct-count sketch.

Why this exists next to ``approx_count_distinct``: Spark's built-in is
HyperLogLog++ and DuckDB's is its own HLL — their estimates can never
hash-match across engines, so the driver's correctness gate could only
ever see a rows-only check. KMV is the classic alternative estimator
(Bar-Yossef et al. 2002): hash every value uniformly into [0, 2^60),
keep the k smallest distinct hashes, and estimate

    D̂ = (k-1) * 2^60 / h_(k)          (h_(k) = k-th smallest hash)

with relative standard error ~1/sqrt(k-2). Because md5-derived hashing
and the order statistic are fully deterministic, Spark and DuckDB
produce BIT-IDENTICAL estimates — an approximate algorithm with an
exact oracle.

Scale shape: one hash-exchange for the per-group distinct on (group,
hash) — the same exchange pattern as exact count-distinct — then a
per-group sort limited by the window. For production corpora where even
the distinct table is too hot, Spark's HLL (``approx_count_distinct``)
is the right runtime choice; KMV here is the cross-engine-verifiable
member of the sketch family, and its bottom-k set is also mergeable
(union + re-take-k), which is what a 100 TB rollup would exploit via a
custom Aggregator. Groups with fewer than k distinct values short-cut
to the exact count (the sketch is lossless below k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from log_formatter_spark.functions.hashing import md5_60, MD5_60_SQL

DEFAULT_K = 64


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """Per-group estimated distinct count of ``value_col``.

    Output: (group_col, est_distinct double, is_exact boolean) —
    ``is_exact`` marks groups below k where the estimate IS the count.
    """
    # NULL values don't count toward distinct cardinality (matching
    # count(DISTINCT v)) — and a NULL hash would rank nulls-first in
    # Spark but nulls-last in DuckDB, shifting the order statistic
    h = md5_60(F.concat(F.col(value_col).cast("string"), F.lit(":kmv")))
    per = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col), h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    cw = Window.partitionBy(group_col)
    ranked = per.select(
        group_col,
        "h",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("n_seen"),
    )
    # (k-1) * 2^60 is exactly representable in binary64, so the whole
    # estimate is one IEEE division — bit-identical across engines
    numer = float((k - 1) << 60)
    est = F.when(F.col("n_seen") < k, F.col("n_seen").cast("double")).otherwise(
        F.lit(numer) / F.col("h").cast("double")
    )
    return (
        ranked.where(F.col("rn") == F.least(F.lit(k), F.col("n_seen")))
        .select(
            group_col,
            est.alias("est_distinct"),
            (F.col("n_seen") < k).alias("is_exact"),
        )
    )


def kmv_distinct_sql(
    src: str = "events",
    group_col: str = "event_type",
    value_col: str = "user_id",
    k: int = DEFAULT_K,
) -> str:
    h = MD5_60_SQL.format(x=f"(CAST({value_col} AS VARCHAR) || ':kmv')")
    numer = float((k - 1) << 60)
    return f"""
WITH per AS (SELECT DISTINCT {group_col}, {h} AS h FROM {src}
             WHERE {value_col} IS NOT NULL),
ranked AS (
  SELECT {group_col}, h,
         row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY {group_col}) AS n_seen
  FROM per
)
SELECT {group_col},
       CASE WHEN n_seen < {k} THEN CAST(n_seen AS DOUBLE)
            ELSE {numer!r} / CAST(h AS DOUBLE) END AS est_distinct,
       n_seen < {k} AS is_exact
FROM ranked WHERE rn = least({k}, n_seen)
"""
