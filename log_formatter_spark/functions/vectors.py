"""Embedding vector math, cross-engine exact.

Dot products are sequential left folds over double-cast elements with a
0.0 initial accumulator in BOTH engines, so Spark and DuckDB produce
bit-identical IEEE doubles (mul, add, sqrt, div are all correctly
rounded) — the driver's value-hash comparison holds without rounding.

JVM-side throughout (``zip_with`` + ``aggregate`` run inside codegen);
no Python in the hot path. For 100 TB-scale similarity, these
expressions are the per-pair kernel under the LSH-bucketed join
(operators/similarity.py), never a full cross product.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float-array columns."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB renderings; format with a/b = FLOAT[]/DOUBLE[] SQL expressions.
DOT_SQL = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(list_zip(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])), "
    "p -> p[1] * p[2])), (x, y) -> x + y)"
)


def dot_sql(a: str, b: str) -> str:
    return DOT_SQL.format(a=a, b=b)


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))"


def with_unit(df, id_col: str, vec_col: str):
    """Add a pre-normalized ``uv`` column (norm computed ONCE per row).

    For pairwise cosine workloads this turns each pair into a single
    dot fold instead of three (dot + two norms) — measured 3× on the
    all-pairs near-dup scan. The norm is materialized as a column
    before the elementwise divide; putting ``norm`` inside the
    ``transform`` lambda would re-fold it per element. Unit-dot cosines
    are NOT bit-identical to the dot/(|a||b|) form, so any oracle must
    use this same unit-vector formulation (``unit_cte_sql``).
    """
    n = norm(F.col(vec_col))
    return (
        df.select(F.col(id_col), _d(F.col(vec_col)).alias(vec_col), n.alias("_n"))
        .select(
            id_col,
            vec_col,
            F.transform(F.col(vec_col), lambda x: x / F.col("_n")).alias("uv"),
        )
    )


def unit_cte_sql(src: str, id_col: str, vec_col: str) -> str:
    """DuckDB rendering of with_unit: (id, vec, uv) rows."""
    return f"""
SELECT {id_col}, {vec_col},
       list_transform(CAST({vec_col} AS DOUBLE[]), x -> x / _n) AS uv
FROM (SELECT {id_col}, {vec_col}, sqrt({dot_sql(vec_col, vec_col)}) AS _n FROM {src})
"""
