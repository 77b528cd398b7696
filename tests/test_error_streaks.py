"""olap.error_streaks: island boundaries, min-length cut, malformed
lines can't join a streak, filter-before-exchange + no second exchange.
"""

from __future__ import annotations

import datetime as dt

from log_formatter_spark.operators import olap
from log_formatter_spark.transcripts import (
    TRANSCRIPT_PATTERN,
    transcripts_from_events,
)

_TS = "2024-01-01 00:00:00"


def _text(level):
    if level is None:  # malformed: level token missing entirely
        return f"{_TS} [bash] hello turn=0"
    return f"{_TS} {level} [bash] hello turn=0"


def _t(spark, rows):
    return spark.createDataFrame(
        [
            (c, i, "system", _text(lvl), "bash", dt.datetime(2024, 1, 1))
            for (c, i, lvl) in rows
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )


def _runs(spark, rows, min_len=2):
    out = olap.error_streaks(_t(spark, rows), TRANSCRIPT_PATTERN, min_len)
    return {
        (r["conv_id"], r["start_turn"]): (r["end_turn"], r["streak_len"])
        for r in out.collect()
    }


def test_islands_split_on_gaps(spark):
    rows = [
        ("a", 0, "ERROR"), ("a", 1, "ERROR"),          # run of 2
        ("a", 2, "INFO"),
        ("a", 3, "ERROR"), ("a", 4, "ERROR"), ("a", 5, "ERROR"),  # run of 3
        ("a", 6, "ERROR"),  # contiguous with 5 -> same run, len 4 total
    ]
    runs = _runs(spark, rows)
    assert runs == {("a", 0): (1, 2), ("a", 3): (6, 4)}


def test_min_len_cuts_singletons(spark):
    rows = [("b", 0, "ERROR"), ("b", 2, "ERROR"), ("b", 4, "ERROR")]
    assert _runs(spark, rows, min_len=2) == {}
    assert len(_runs(spark, rows, min_len=1)) == 3


def test_malformed_line_breaks_a_streak(spark):
    """A malformed line (no level token) is not an ERROR turn even if
    the conversation is mid-incident — it splits the island."""
    rows = [
        ("c", 0, "ERROR"), ("c", 1, None), ("c", 2, "ERROR"),
        ("c", 3, "ERROR"),
    ]
    runs = _runs(spark, rows)
    assert runs == {("c", 2): (3, 2)}


def test_plan_filters_before_exchange_no_regroup(spark, sf_dir):
    df = olap.error_streaks(transcripts_from_events(spark, sf_dir), TRANSCRIPT_PATTERN)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    ex = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    # only the two view/window exchanges (user_id builds turn_idx,
    # conv_id orders the islands); the run aggregate re-uses the
    # conv_id clustering — NO exchange on the island key
    assert len(ex) == 2, plan
    assert not any("_isl" in e for e in ex)
    # the ERROR filter runs BELOW the conv_id exchange: only error
    # rows shuffle (deeper in the printed tree = larger offset)
    conv_ex = min(m.start() for m in re.finditer(r"Exchange hashpartitioning\(conv_id", plan))
    assert plan.index("= ERROR") > conv_ex
