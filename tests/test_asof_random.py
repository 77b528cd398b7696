"""Randomized as-of join spec test: 300 seeded-random rows with dense
key/ts collisions, checked row-by-row against a brute-force Python
oracle (latest right row with right.ts <= left.ts, max tiebreak on
ties). Catches boundary/tie bugs the hand-built cases might miss."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import Row

from log_formatter_spark.operators.asof import asof_join


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_matches_bruteforce(spark):
    rng = random.Random(20240817)
    # dense domains force many equal-ts ties and cross-key collisions
    keys = ["a", "b", "c"]
    left = [
        Row(k=rng.choice(keys), ts=_ts(rng.randrange(30)), lid=i)
        for i in range(150)
    ]
    right = [
        Row(k=rng.choice(keys), ts=_ts(rng.randrange(30)), rid=i,
            v=None if i % 7 == 0 else f"v{i}")
        for i in range(150)
    ]
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    out = asof_join(
        ldf, rdf, on="k", ts_col="ts", value_cols=["rid", "v"],
        tiebreak_col="rid", prefix="m_",
    )
    got = {r["lid"]: (r["m_ts"], r["m_rid"], r["m_v"]) for r in out.collect()}

    for lrow in left:
        cands = [r for r in right if r.k == lrow.k and r.ts <= lrow.ts]
        if not cands:
            want = (None, None, None)
        else:
            best = max(cands, key=lambda r: (r.ts, r.rid))
            want = (best.ts, best.rid, best.v)
        assert got[lrow.lid] == want, (lrow, got[lrow.lid], want)
