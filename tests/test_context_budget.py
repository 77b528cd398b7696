"""Semantics of packing.context_budget: maximal-suffix selection, the
over-budget-turn drop rule, zero-token turns, and suffix contiguity +
maximality on the driver view.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from log_formatter_spark.operators import packing
from log_formatter_spark.transcripts import transcripts_from_events

_TS = dt.datetime(2024, 1, 1)


def _t(spark, rows):
    return spark.createDataFrame(
        [(c, i, "user", text, "bash", _TS) for (c, i, text) in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )


def _kept(spark, rows, budget):
    out = packing.context_budget(_t(spark, rows), budget=budget).collect()
    return {(r["conv_id"], r["turn_idx"]): r for r in out}


def test_maximal_suffix(spark):
    rows = [
        ("a", 0, "one two three"),          # 3 tokens
        ("a", 1, "four five"),              # 2
        ("a", 2, "six"),                    # 1
    ]
    kept = _kept(spark, rows, budget=3)
    # suffix sums from the end: turn2=1, turn1=3, turn0=6
    assert set(kept) == {("a", 1), ("a", 2)}
    assert kept[("a", 1)]["suffix_tokens"] == 3
    assert kept[("a", 2)]["suffix_tokens"] == 1


def test_oversized_turn_drops_conversation(spark):
    rows = [("b", 0, "a b"), ("b", 1, "w x y z q r s t")]  # last turn 8 > 4
    assert _kept(spark, rows, budget=4) == {}


def test_zero_token_turn_is_free(spark):
    rows = [("c", 0, "alpha beta"), ("c", 1, ""), ("c", 2, "gamma")]
    kept = _kept(spark, rows, budget=3)
    assert set(kept) == {("c", 0), ("c", 1), ("c", 2)}
    assert kept[("c", 1)]["n_tokens"] == 0


def test_driver_view_suffix_contiguous_and_maximal(spark, sf_dir):
    t = transcripts_from_events(spark, sf_dir)
    kept = packing.context_budget(t).collect()
    assert kept, "budget keeps nothing on the driver view"
    last = {
        r["conv_id"]: r["max_ti"]
        for r in t.groupBy("conv_id").agg(F.max("turn_idx").alias("max_ti")).collect()
    }
    by_conv: dict[str, list] = {}
    for r in kept:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for conv, rows in by_conv.items():
        idxs = sorted(r["turn_idx"] for r in rows)
        # contiguous run ending at the conversation's last turn
        assert idxs[-1] == last[conv]
        assert idxs == list(range(idxs[0], idxs[-1] + 1))
        # maximality: the suffix one turn longer must bust the budget
        total = max(r["suffix_tokens"] for r in rows)
        assert total <= packing.CONTEXT_BUDGET
        if idxs[0] > 0:
            prev_tokens = (
                t.where(
                    (F.col("conv_id") == conv) & (F.col("turn_idx") == idxs[0] - 1)
                )
                .select(F.size(F.split(F.col("text"), " ")).alias("n"))
                .collect()[0]["n"]
            )
            assert total + prev_tokens > packing.CONTEXT_BUDGET
