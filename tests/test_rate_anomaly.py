"""olap.rate_anomaly: exact-integer flag decision, zero-variance and
single-bucket guards, and agreement with a float z-score oracle on the
driver view.
"""

from __future__ import annotations

import datetime as dt
import math

from log_formatter_spark.operators import olap
from log_formatter_spark.transcripts import transcripts_from_events


def _t(spark, rows):
    return spark.createDataFrame(
        [
            ("c", i, "user", "x", tool, dt.datetime(2024, 1, 1, hour, m))
            for i, (tool, hour, m) in enumerate(rows)
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )


def _by_bucket(spark, rows, z2=olap.RATE_Z2):
    out = olap.rate_anomaly(_t(spark, rows), z2=z2).collect()
    return {(r["key"], r["hour"].hour): r for r in out}


def test_spike_flagged(spark):
    # a SINGLE outlier among constants scores exactly n-1 regardless of
    # magnitude (max attainable z^2), so 3 sigma needs n > 10 buckets:
    # 19 quiet hours of 1 call, one hour of 20 -> score 19 > 9
    rows = [("bash", h, 0) for h in range(19)]
    rows += [("bash", 19, m) for m in range(20)]
    out = _by_bucket(spark, rows)
    assert out[("bash", 19)]["is_anomaly"] is True
    assert math.isclose(out[("bash", 19)]["dev_score"], 19.0)
    for h in range(19):
        assert out[("bash", h)]["is_anomaly"] is False


def test_boundary_is_not_flagged(spark):
    """With exactly 10 buckets a single outlier scores exactly 9.0 =
    z^2 — the flag is a STRICT >, and the exact-integer comparison
    makes the boundary deterministic (a float pipeline would flip on
    rounding)."""
    rows = [("zsh", h, 0) for h in range(9)]
    rows += [("zsh", 9, m) for m in range(20)]
    out = _by_bucket(spark, rows)
    assert out[("zsh", 9)]["dev_score"] == 9.0
    assert out[("zsh", 9)]["is_anomaly"] is False


def test_constant_series_never_flags(spark):
    rows = [("sed", h, m) for h in range(6) for m in range(3)]
    out = _by_bucket(spark, rows)
    for h in range(6):
        assert out[("sed", h)]["is_anomaly"] is False
        assert out[("sed", h)]["dev_score"] is None  # zero variance


def test_single_bucket_never_flags(spark):
    out = _by_bucket(spark, [("awk", 0, 0), ("awk", 0, 1)])
    assert out[("awk", 0)]["is_anomaly"] is False
    assert out[("awk", 0)]["dev_score"] is None


def test_driver_view_matches_float_zscore(spark, sf_dir):
    """The exact-integer decision must agree with the straightforward
    float z-score wherever the float computation is unambiguous."""
    rows = olap.rate_anomaly(transcripts_from_events(spark, sf_dir)).collect()
    assert rows
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)
    for key, bs in by_key.items():
        cs = [r["n_turns"] for r in bs]
        n = len(cs)
        mean = sum(cs) / n
        var = sum((c - mean) ** 2 for c in cs) / n
        for r in bs:
            if var == 0:
                assert r["is_anomaly"] is False
                continue
            z2 = (r["n_turns"] - mean) ** 2 / var
            assert math.isclose(r["dev_score"], z2, rel_tol=1e-9)
            if abs(z2 - olap.RATE_Z2) > 1e-6:  # away from the boundary
                assert r["is_anomaly"] == (z2 > olap.RATE_Z2)
