"""Semantic tests for preference-pair mining (transcripts.preference_pairs).

The contract replica (tests/test_contract.py) proves Spark≡DuckDB on the
driver fixture; these tests pin the SEMANTICS on a hand-built transcript
where the expected pairs are known by inspection: canonical-prompt
grouping across conversations with different timestamps, latency-reward
selection, deterministic tie-breaking, and exclusion of groups with no
strict preference.
"""

from __future__ import annotations

import datetime as dt

import pytest

from log_formatter_spark.transcripts import preference_pairs

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _turn(conv, idx, role, body, secs):
    # text carries the 'YYYY-MM-DD HH:MM:SS ' prefix that the canonical
    # prompt strips — per-conv offsets make the RAW context differ while
    # the canonical context matches
    ts = T0 + dt.timedelta(seconds=secs)
    return (conv, idx, role, ts.strftime("%Y-%m-%d %H:%M:%S") + " " + body, "", ts)


def _fixture(spark):
    rows = []
    # three conversations with the SAME canonical 2-turn context before
    # the assistant turn at idx 2, different response latencies
    for conv, base, lat in [("c1", 0, 30), ("c2", 1000, 10), ("c3", 2000, 20)]:
        rows += [
            _turn(conv, 0, "user", "INFO [] ask turn=0", base),
            _turn(conv, 1, "system", "INFO [] note turn=1", base + 5),
            _turn(conv, 2, "assistant", "INFO [] answer turn=2", base + 5 + lat),
        ]
    # a fourth conversation with a DIFFERENT context -> its own group of 1
    rows += [
        _turn("c4", 0, "user", "INFO [] other turn=0", 3000),
        _turn("c4", 1, "system", "INFO [] note turn=1", 3005),
        _turn("c4", 2, "assistant", "INFO [] answer turn=2", 3020),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_latency_preference_and_grouping(spark):
    out = preference_pairs(_fixture(spark), context_turns=2).collect()
    # c4's singleton group has no strict preference -> exactly one pair
    assert len(out) == 1
    row = out[0]
    assert row.n_candidates == 3
    assert (row.chosen_conv, row.chosen_latency_us) == ("c2", 10_000_000)
    assert (row.rejected_conv, row.rejected_latency_us) == ("c1", 30_000_000)


def test_tie_breaks_by_conv_then_turn(spark):
    # two candidates with EQUAL latency and one slower: chosen must be
    # the lexicographically smallest (latency, conv_id, turn_idx)
    rows = []
    for conv, base, lat in [("a", 0, 10), ("b", 100, 10), ("c", 200, 40)]:
        rows += [
            _turn(conv, 0, "user", "INFO [] ask turn=0", base),
            _turn(conv, 1, "system", "INFO [] note turn=1", base + 2),
            _turn(conv, 2, "assistant", "INFO [] answer turn=2", base + 2 + lat),
        ]
    out = preference_pairs(spark.createDataFrame(rows, SCHEMA), context_turns=2)
    row = out.collect()[0]
    assert row.chosen_conv == "a"  # tie between a and b -> smaller conv_id
    assert row.rejected_conv == "c"


def test_no_pair_when_all_latencies_equal(spark):
    rows = []
    for conv, base in [("a", 0), ("b", 100)]:
        rows += [
            _turn(conv, 0, "user", "INFO [] ask turn=0", base),
            _turn(conv, 1, "system", "INFO [] note turn=1", base + 2),
            _turn(conv, 2, "assistant", "INFO [] answer turn=2", base + 7),
        ]
    assert preference_pairs(spark.createDataFrame(rows, SCHEMA), context_turns=2).count() == 0


def test_opener_and_short_context_excluded(spark):
    # assistant turns with fewer than context_turns preceding turns are
    # not candidates (no full prompt)
    rows = [
        _turn("a", 0, "assistant", "INFO [] hi turn=0", 0),
        _turn("a", 1, "assistant", "INFO [] hi turn=1", 5),
        _turn("b", 0, "assistant", "INFO [] hi turn=0", 100),
        _turn("b", 1, "assistant", "INFO [] hi turn=1", 103),
    ]
    assert preference_pairs(spark.createDataFrame(rows, SCHEMA), context_turns=2).count() == 0
