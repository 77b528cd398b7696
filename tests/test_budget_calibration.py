"""token_budget_fill (water-filling under repeat caps) and
quality_calibration (per-source percentile transform): semantic
properties the oracle hash can't see. Cross-engine parity is covered by
the parameterized test_contract replica."""

from __future__ import annotations

import math

from pyspark.sql import Row

from log_formatter_spark.operators.corpus import quality_calibration, token_budget_fill


def _docs(spark, rows):
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source=s, n_chars=len(t))
            for i, (s, t) in enumerate(rows)
        ]
    )


def test_water_filling_pivot_caps_and_redistributes(spark):
    """One tiny source caps out; its surplus raises the water level for
    the rest, and the total still lands exactly on the budget."""
    tiny = "a b"                                # 2 tokens -> cap 8
    big = " ".join(f"w{i}" for i in range(100))  # 100 tokens -> cap 400
    df = _docs(spark, [("tiny", tiny), ("big1", big), ("big2", big)])
    rows = {r["source"]: r for r in token_budget_fill(df, budget=300, max_epochs=4).collect()}
    assert rows["tiny"]["alloc"] == 8.0 and not rows["tiny"]["filled"]
    # remaining 292 split evenly across the two uncapped sources
    assert rows["big1"]["alloc"] == rows["big2"]["alloc"] == 146.0
    assert rows["big1"]["filled"] and rows["big2"]["filled"]
    assert sum(r["alloc"] for r in rows.values()) == 300.0
    assert math.isclose(rows["tiny"]["epochs"], 4.0)


def test_water_filling_budget_exceeds_capacity(spark):
    """No pivot: every source caps at tokens*E and nothing is filled —
    the caller's shortfall signal."""
    df = _docs(spark, [("s1", "a b c"), ("s2", "d e")])
    rows = {r["source"]: r for r in token_budget_fill(df, budget=10**9, max_epochs=2).collect()}
    assert rows["s1"]["alloc"] == 6.0 and rows["s2"]["alloc"] == 4.0
    assert not rows["s1"]["filled"] and not rows["s2"]["filled"]
    assert all(math.isclose(r["epochs"], 2.0) for r in rows.values())


def test_water_filling_uniform_when_no_caps_bind(spark):
    df = _docs(spark, [("s1", "a b c d"), ("s2", "e f")])
    rows = {r["source"]: r for r in token_budget_fill(df, budget=6, max_epochs=10).collect()}
    assert rows["s1"]["alloc"] == rows["s2"]["alloc"] == 3.0


def test_calibration_is_per_source_rank(spark, sf_dir):
    """pct_in_source is a strict-total-order percent_rank inside each
    source: min 0, max 1, monotone in quality_score."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = quality_calibration(docs).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src) > 1
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r["quality_score"], r["doc_id"]))
        pcts = [r["pct_in_source"] for r in rs]
        assert pcts[0] == 0.0 and pcts[-1] == 1.0
        assert pcts == sorted(pcts), src
        n = len(rs)
        for i, r in enumerate(rs):
            assert r["pct_in_source"] == i / (n - 1)


def test_calibration_single_doc_source_and_zero_tokens(spark):
    df = _docs(spark, [("solo", "the quick brown fox"), ("empty", "   ")])
    rows = quality_calibration(df).collect()
    assert len(rows) == 1
    assert rows[0]["source"] == "solo" and rows[0]["pct_in_source"] == 0.0
