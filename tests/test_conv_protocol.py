"""conversations.conv_protocol: FSM edge semantics, start-role rule,
first-violation position, and the conformant/violating split on the
driver view.
"""

from __future__ import annotations

import datetime as dt

from log_formatter_spark.operators import conversations
from log_formatter_spark.transcripts import transcripts_from_events

_TS = dt.datetime(2024, 1, 1)


def _t(spark, convs):
    rows = []
    for c, roles in convs.items():
        rows += [(c, i, r, "x", "bash", _TS) for i, r in enumerate(roles)]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )


def _out(spark, convs):
    return {
        r["conv_id"]: r
        for r in conversations.conv_protocol(_t(spark, convs)).collect()
    }


def test_canonical_loop_conforms(spark):
    out = _out(
        spark,
        {
            "ok1": ["system", "user", "assistant", "tool", "tool", "assistant", "user"],
            "ok2": ["user", "assistant", "user", "assistant"],
        },
    )
    for c in ("ok1", "ok2"):
        assert out[c]["conforms"] is True
        assert out[c]["n_violations"] == 0
        assert out[c]["first_bad_turn"] is None


def test_bad_start_flagged_at_zero(spark):
    out = _out(spark, {"bad": ["tool", "assistant", "user"]})
    r = out["bad"]
    assert r["conforms"] is False
    assert r["first_bad_turn"] == 0
    # tool->assistant and assistant->user are legal edges; only the
    # start violates
    assert r["n_violations"] == 1


def test_illegal_edge_position(spark):
    # user->user is not an allowed edge; everything else is legal
    out = _out(spark, {"c": ["user", "assistant", "user", "user", "assistant"]})
    r = out["c"]
    assert r["conforms"] is False
    assert r["first_bad_turn"] == 3
    assert r["n_violations"] == 1


def test_driver_view_split(spark, sf_dir):
    rows = conversations.conv_protocol(transcripts_from_events(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        assert (r["n_violations"] == 0) == r["conforms"]
        if not r["conforms"]:
            assert 0 <= r["first_bad_turn"] < r["n_turns"]
        else:
            assert r["first_bad_turn"] is None


def test_null_role_excluded_subsequence(spark):
    """NULL-role turns neither emit nor break adjacency (oracle-parity
    rule: Spark concat_ws drops NULLs where SQL || nulls out — the two
    engines would otherwise disagree)."""
    rows = [
        ("n", 0, "user"), ("n", 1, None), ("n", 2, "assistant"),
    ]
    df = spark.createDataFrame(
        [(c, i, r, "x", "bash", _TS) for (c, i, r) in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )
    out = {r["conv_id"]: r for r in conversations.conv_protocol(df).collect()}
    r = out["n"]
    # user -> assistant over the role-bearing subsequence: conformant
    assert r["conforms"] is True
    assert r["n_turns"] == 2  # the NULL turn is not counted
