"""Similarity search over embedding columns.

- ``brute_topk``   : exact cosine top-k. The *query* side is broadcast
                     (queries ≪ corpus), so the corpus scan stays
                     shuffle-free: one pass, per-partition ranking, then
                     a tiny top-k-per-query final reduction.
- ``lsh_topk``     : sign-LSH bucketed ANN — the 100 TB path. Every
                     vector gets a b-bit bucket from the signs of its
                     dot products with b fixed anchor vectors
                     (deterministic: anchors are the lowest-id vectors,
                     not random planes, so reruns and the DuckDB oracle
                     agree exactly). Candidates join on bucket equality;
                     ranking runs per bucket. Recall < 1 by design —
                     the exact baseline above is the correctness anchor.

Window ranking ties are broken by neighbor id, so results are total-order
deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from log_formatter_spark.functions.vectors import cosine, cosine_sql, dot, dot_sql

N_ANCHORS = 8


def brute_topk(
    emb: DataFrame,
    k: int = 10,
    n_queries: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for queries = the ``n_queries`` lowest ids."""
    q = emb.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = c.join(F.broadcast(q), F.col("q_id") != F.col("neighbor_id")).select(
        "q_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "cos")
    )


def brute_topk_sql(
    src: str = "embeddings",
    k: int = 10,
    n_queries: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    cos = cosine_sql(f"q.{vec_col}", f"c.{vec_col}")
    return f"""
WITH pairs AS (
  SELECT q.{id_col} AS q_id, c.{id_col} AS neighbor_id, {cos} AS cos
  FROM {src} q, {src} c
  WHERE q.{id_col} < {n_queries} AND q.{id_col} <> c.{id_col}
)
SELECT q_id, neighbor_id, rank, cos FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM pairs
) WHERE rank <= {k}
"""


def bucketed(
    emb: DataFrame,
    n_anchors: int = N_ANCHORS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector a sign-LSH bucket (bit i = dot with anchor i ≥ 0).

    Anchors (the ``n_anchors`` lowest-id vectors) are broadcast; bucket
    assignment is a map-only pass over the corpus.
    """
    anchors = emb.where(F.col(id_col) < n_anchors).select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("av")
    )
    bits = emb.crossJoin(F.broadcast(anchors)).select(
        F.col(id_col),
        F.col(vec_col),
        F.when(dot(F.col(vec_col), F.col("av")) >= 0, F.expr("shiftleft(1L, a_id)"))
        .otherwise(F.lit(0).cast("long"))
        .alias("bit"),
    )
    return bits.groupBy(id_col, vec_col).agg(F.sum("bit").cast("long").alias("bucket"))


def lsh_topk(
    emb: DataFrame,
    k: int = 10,
    n_queries: int = 8,
    n_anchors: int = N_ANCHORS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: rank only candidates in the query's bucket."""
    b = bucketed(emb, n_anchors=n_anchors, id_col=id_col, vec_col=vec_col)
    q = b.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    c = b.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    pairs = c.join(F.broadcast(q), on="bucket").where(
        F.col("q_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.select("q_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "cos")
    )


def lsh_topk_sql(
    src: str = "embeddings",
    k: int = 10,
    n_queries: int = 8,
    n_anchors: int = N_ANCHORS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    d = dot_sql(f"v.{vec_col}", f"a.{vec_col}")
    cos = cosine_sql("q.qv", "c.cv")
    return f"""
WITH bucketed AS (
  SELECT v.{id_col}, v.{vec_col},
         CAST(sum(CASE WHEN {d} >= 0 THEN (1::BIGINT << a.{id_col}) ELSE 0 END) AS BIGINT) AS bucket
  FROM {src} v, {src} a
  WHERE a.{id_col} < {n_anchors}
  GROUP BY v.{id_col}, v.{vec_col}
),
q AS (SELECT {id_col} AS q_id, {vec_col} AS qv, bucket FROM bucketed WHERE {id_col} < {n_queries}),
c AS (SELECT {id_col} AS neighbor_id, {vec_col} AS cv, bucket FROM bucketed),
pairs AS (
  SELECT q.q_id, c.neighbor_id, {cos} AS cos
  FROM c JOIN q ON c.bucket = q.bucket AND q.q_id <> c.neighbor_id
)
SELECT q_id, neighbor_id, rank, cos FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM pairs
) WHERE rank <= {k}
"""
