"""Semantics of transcripts.tool_transitions: consecutive-pair counting
within a conversation, NULL-tool subsequence rule, distinct-conversation
attribution, exact-integer outgoing-edge shares, and the one-exchange
lag plan.
"""

from __future__ import annotations

import datetime as dt

from log_formatter_spark.transcripts import (
    tool_transitions,
    transcripts_from_events,
)

_TS = dt.datetime(2024, 1, 1, 0, 0)


def _t(spark, rows):
    return spark.createDataFrame(
        [(c, i, "assistant", "x", tool, _TS) for (c, i, tool) in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )


def _collect(spark, rows):
    return {
        (r["prev_tool"], r["tool"]): r
        for r in tool_transitions(_t(spark, rows)).collect()
    }


def test_pair_counting_and_null_rule(spark):
    out = _collect(
        spark,
        [
            ("a", 0, "grep"), ("a", 1, "bash"), ("a", 2, "bash"),
            ("b", 0, "grep"), ("b", 1, None), ("b", 2, "bash"),
            ("c", 0, "bash"),
        ],
    )
    # grep->bash from both convs; the null-tool turn in b is skipped
    assert out[("grep", "bash")]["n_pairs"] == 2
    assert out[("grep", "bash")]["n_convs"] == 2
    # bash->bash only in conv a
    assert out[("bash", "bash")]["n_pairs"] == 1
    assert out[("bash", "bash")]["n_convs"] == 1
    assert len(out) == 2  # conv c emits nothing


def test_share_ppm_exact_integer(spark):
    out = _collect(
        spark,
        [
            # grep fans out 3:1 to bash vs sed -> shares 750000 / 250000
            ("a", 0, "grep"), ("a", 1, "bash"),
            ("b", 0, "grep"), ("b", 1, "bash"),
            ("c", 0, "grep"), ("c", 1, "bash"),
            ("d", 0, "grep"), ("d", 1, "sed"),
        ],
    )
    assert out[("grep", "bash")]["share_ppm"] == 750000
    assert out[("grep", "sed")]["share_ppm"] == 250000


def test_shares_sum_to_a_million_ish(spark, sf_dir):
    """Per prev_tool, floor shares sum to 1e6 - (rounding loss < n_edges)."""
    rows = tool_transitions(transcripts_from_events(spark, sf_dir)).collect()
    by_prev: dict[str, list] = {}
    for r in rows:
        by_prev.setdefault(r["prev_tool"], []).append(r)
    assert by_prev, "driver view produced no transitions"
    for prev, edges in by_prev.items():
        s = sum(e["share_ppm"] for e in edges)
        assert 1_000_000 - len(edges) < s <= 1_000_000, (prev, s)


def test_single_conv_key_exchange(spark, sf_dir):
    """The lag window is the ONLY row-scale exchange; the transition
    aggregate and its share window run on the |tools|^2-bounded frame."""
    plan = (
        tool_transitions(transcripts_from_events(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
