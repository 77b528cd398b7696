"""BM25 retrieval tests.

Three layers:

1. the cross-engine determinism precondition — Python ``math.log``
   must bit-match DuckDB's ``ln`` on this box (both glibc libm); the
   operator injects driver-computed idf literals on that basis, because
   Spark's JVM ``Math.log`` measurably does NOT bit-match
   (~7% last-ulp divergence, measured in round 3);
2. a brute-force pure-Python BM25 over the collected corpus —
   score-by-score within float tolerance and exact top-k membership;
3. empty-input robustness.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from log_formatter_spark.operators.retrieval import DEFAULT_QUERY_TERMS, bm25_topk


def test_python_log_matches_duckdb():
    """Pin the idf determinism basis: math.log == DuckDB ln bit-for-bit
    over the rational arguments BM25 idf actually produces."""
    con = duckdb.connect()
    args = [
        (n - df + 0.5) / (df + 0.5) + 1.0
        for n in (1, 10, 500, 10_000, 1_000_000)
        for df in (0, 1, 2, 7, n // 3 + 1, n)
    ]
    for x in args:
        (duck_ln,) = con.execute("SELECT ln(CAST(? AS DOUBLE))", [x]).fetchone()
        assert math.log(x) == duck_ln, f"ln({x}): {math.log(x)!r} != {duck_ln!r}"


def _brute_bm25(rows, terms, k1=1.2, b=0.75):
    toks = {r["doc_id"]: [t for t in r["text"].lower().split(" ") if t] for r in rows}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    idf = {t: math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0) for t in terms}
    out = {}
    for d, v in toks.items():
        s, nt = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            nt += 1
            dl = len(v)
            s += idf[t] * (tf * (k1 + 1.0)) / (tf + k1 * ((1 - b) + b * (dl / avgdl)))
        if nt:
            out[d] = (nt, s)
    return out


def test_bm25_matches_bruteforce(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = docs.select("doc_id", "text").collect()
    expect = _brute_bm25(rows, DEFAULT_QUERY_TERMS)
    got = bm25_topk(docs, k=30).collect()
    assert len(got) == min(30, len(expect))
    # top-k set: every returned doc must out-score (or tie at the
    # boundary with lower doc_id than) every excluded doc
    returned = {r["doc_id"] for r in got}
    floor = min(expect[d][1] for d in returned)
    better = sorted(
        (d for d, (_, s) in expect.items() if s > floor + 1e-9), key=lambda d: d
    )
    assert set(better) <= returned
    for r in got:
        nt, s = expect[r["doc_id"]]
        assert r["n_terms"] == nt
        assert r["score"] == pytest.approx(s, rel=1e-12)


def _unit(v):
    ss = 0.0
    for x in v:  # left-to-right fold, mirroring Spark's HOF aggregate
        ss = ss + x * x
    n = math.sqrt(ss)
    return [x / n for x in v]


def test_rrf_matches_bruteforce(spark, sf_dir):
    from log_formatter_spark.operators.retrieval import RRF_K, rrf_hybrid

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    depth, k = 50, 20

    lex_scores = _brute_bm25(docs.select("doc_id", "text").collect(), DEFAULT_QUERY_TERMS)
    lex_list = sorted(lex_scores, key=lambda d: (-lex_scores[d][1], d))[:depth]
    lex_rank = {d: i + 1 for i, d in enumerate(lex_list)}

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.select("vec_id", "embedding").collect()
    }
    q = _unit(vecs[min(vecs)])
    cos = {}
    for vid, v in vecs.items():
        if vid == min(vecs):
            continue
        u, s = _unit(v), 0.0
        for a, b in zip(q, u):
            s = s + a * b
        cos[vid] = s
    dense_list = sorted(cos, key=lambda d: (-cos[d], d))[:depth]
    dense_rank = {d: i + 1 for i, d in enumerate(dense_list)}

    fused = {
        d: (1.0 / (RRF_K + lex_rank[d]) if d in lex_rank else 0.0)
        + (1.0 / (RRF_K + dense_rank[d]) if d in dense_rank else 0.0)
        for d in set(lex_rank) | set(dense_rank)
    }
    expect = sorted(fused, key=lambda d: (-fused[d], d))[:k]

    got = rrf_hybrid(docs, emb, k=k, depth=depth).collect()
    assert [r["doc_id"] for r in got] == expect
    for r in got:
        assert r["lex_rank"] == lex_rank.get(r["doc_id"])
        assert r["dense_rank"] == dense_rank.get(r["doc_id"])
        assert r["rrf"] == pytest.approx(fused[r["doc_id"]], rel=1e-12)


def test_rrf_empty_inputs(spark, sf_dir):
    from log_formatter_spark.operators.retrieval import rrf_hybrid

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = rrf_hybrid(docs.limit(0), emb.limit(0))
    assert out.count() == 0
    assert out.columns == ["doc_id", "lex_rank", "dense_rank", "rrf"]
    # one-sided: empty dense list must still yield the lexical ranking
    lex_only = rrf_hybrid(docs, emb.limit(0), k=5).collect()
    assert [r["lex_rank"] for r in lex_only] == [1, 2, 3, 4, 5]
    assert all(r["dense_rank"] is None for r in lex_only)


def test_bm25_empty_input(spark, sf_dir):
    empty = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(0)
    out = bm25_topk(empty)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_terms", "score"]


def test_rrf_dense_knob(spark, sf_dir):
    """VERDICT r3 #3: the dense side must be swappable to the ANN
    scorers for production depth. The ANN-fused lists must (a) run
    without the exact all-pairs scan in the plan, (b) keep the fusion
    arithmetic identical (any doc ranked by BOTH configs at the same
    ranks gets the same rrf score), and (c) overlap substantially with
    the exact fusion at contract scale."""
    from log_formatter_spark.operators.retrieval import rrf_hybrid

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    exact = rrf_hybrid(docs, emb, k=20, depth=50).collect()
    exact_ids = [r["doc_id"] for r in exact]
    exact_rrf = {(r["lex_rank"], r["dense_rank"]): r["rrf"] for r in exact}

    with pytest.raises(ValueError, match="dense must be one of"):
        rrf_hybrid(docs, emb, dense="hnsw")

    for dense in ("lsh", "ivf", "pq"):
        fused = rrf_hybrid(docs, emb, k=20, depth=50, dense=dense)
        plan = fused._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, dense
        if dense != "pq":
            # pq's ADC is BY DESIGN a broadcast-query linear scan over
            # the m-int codes table (O(n·q), never O(n²) — the same
            # allow-listed shape as the pq_topk catalog entry); lsh/ivf
            # must stay pure equality joins.
            assert "BroadcastNestedLoopJoin" not in plan, dense
        rows = fused.collect()
        assert 0 < len(rows) <= 20
        got_ids = [r["doc_id"] for r in rows]
        overlap = len(set(got_ids) & set(exact_ids)) / len(exact_ids)
        assert overlap >= 0.5, (dense, overlap)
        for r in rows:
            key = (r["lex_rank"], r["dense_rank"])
            if key in exact_rrf:
                assert r["rrf"] == exact_rrf[key], (dense, key)
