"""error_burst unit semantics on a crafted timeline: cold start (NULL
ratio), steady baseline (ratio 1), a 5x spike, and a gap that ages the
baseline out of the trailing window. Cross-engine parity is covered by
the contract replica."""

from __future__ import annotations

from log_formatter_spark.operators.olap import error_burst

PAT = r"(?P<word>\w+) (?P<level>[A-Z]+)"


def _t(spark, rows):
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts_s string",
    )
    return df.selectExpr(
        "conv_id", "turn_idx", "role", "text", "tool",
        "CAST(ts_s AS TIMESTAMP_NTZ) AS ts",
    )


def test_error_burst_ratio_and_gaps(spark):
    rows = []

    def err(hour, k):
        for i in range(k):
            rows.append(("c", 0, "s", "boom ERROR", "", f"2020-01-01 {hour:02d}:0{i}:00"))

    err(0, 2)   # cold start: no baseline -> NULL ratio
    err(1, 2)   # baseline {2} -> ratio 1.0
    err(2, 10)  # burst vs mean(2,2)=2 -> ratio 5.0
    # hours 3..23 quiet; hour 30 only sees hours 6..29 trailing -> all
    # prior error hours aged out or absent -> NULL ratio again
    rows.append(("c", 0, "s", "boom ERROR", "", "2020-01-02 06:00:00"))
    rows.append(("c", 0, "s", "calm INFO", "", "2020-01-01 02:30:00"))  # non-error ignored

    out = {
        r["hour"].hour + 24 * (r["hour"].day - 1): (
            r["n_errors"],
            r["trailing_errors"],
            r["trailing_hours"],
            r["burst_ratio"],
        )
        for r in error_burst(_t(spark, rows), PAT).collect()
    }
    assert out[0] == (2, 0, 0, None)
    assert out[1] == (2, 2, 1, 1.0)
    assert out[2] == (10, 4, 2, 5.0)
    assert out[30] == (1, 0, 0, None)
    assert len(out) == 4
