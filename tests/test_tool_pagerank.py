"""transcripts.tool_pagerank: fixed-point arithmetic against a
hand-rolled reference, cycle symmetry, dangling-mass bound, and
hub-over-leaf ordering.
"""

from __future__ import annotations

import datetime as dt

from log_formatter_spark.transcripts import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_ITERS,
    PR_SCALE,
    tool_pagerank,
)

_TS = dt.datetime(2024, 1, 1)


def _t(spark, chains):
    rows = []
    for c, tools in enumerate(chains):
        rows += [
            (f"c{c}", i, "assistant", "x", tool, _TS)
            for i, tool in enumerate(tools)
        ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )


def _py_pagerank(chains, iters=PR_ITERS):
    edges: dict[tuple, int] = {}
    for tools in chains:
        for u, v in zip(tools, tools[1:]):
            edges[(u, v)] = edges.get((u, v), 0) + 1
    out_w: dict[str, int] = {}
    nodes = set()
    for (u, v), n in edges.items():
        out_w[u] = out_w.get(u, 0) + n
        nodes.update((u, v))
    n_nodes = len(nodes)
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n_nodes)
    r = {v: PR_SCALE // n_nodes for v in nodes}
    for _ in range(iters):
        c: dict[str, int] = {}
        for (u, v), n in edges.items():
            c[v] = c.get(v, 0) + (r[u] * n) // out_w[u]
        r = {v: base + (PR_DAMP_NUM * c.get(v, 0)) // PR_DAMP_DEN for v in nodes}
    return r


def test_matches_python_reference(spark):
    chains = [
        ["grep", "bash", "write"],
        ["read", "bash", "write"],
        ["bash", "write", "bash"],
    ]
    expect = _py_pagerank(chains)
    got = {r["tool"]: r["rank_fp"] for r in tool_pagerank(_t(spark, chains)).collect()}
    assert got == expect


def test_cycle_is_symmetric(spark):
    # a -> b -> c -> a repeated: perfect cycle, equal ranks
    chains = [["a", "b", "c", "a", "b", "c", "a"]]
    rows = tool_pagerank(_t(spark, chains)).collect()
    ranks = {r["tool"]: r["rank_fp"] for r in rows}
    assert len(set(ranks.values())) == 1


def test_hub_outranks_leaf_and_mass_bounded(spark):
    # everything hands off to 'hub'; 'leafN' are only ever sources
    chains = [[f"leaf{i}", "hub"] for i in range(4)]
    rows = tool_pagerank(_t(spark, chains)).collect()
    ranks = {r["tool"]: r["rank_fp"] for r in rows}
    assert all(ranks["hub"] > ranks[f"leaf{i}"] for i in range(4))
    # hub is dangling -> its mass leaks; total stays under SCALE
    assert sum(ranks.values()) < PR_SCALE
    for r in rows:
        assert r["rank"] == r["rank_fp"] / PR_SCALE  # exact 2^-40 scaling
