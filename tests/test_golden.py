"""Golden E2E outputs (FIXTURES.md §3): the flagship per-sink aggregate
counts over the driver sf0.001 testdata are committed and must never
drift between rounds — the cross-round equivalent of the reference's
E2E equality check, content-exact."""

from __future__ import annotations

import json
import os

from log_formatter_spark.pipeline import PipelineOptions, full_pipeline
from log_formatter_spark.transcripts import transcripts_from_events

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "sink_counts_sf0.001.json")


def test_flagship_counts_match_golden(spark, sf_dir):
    with open(GOLDEN) as f:
        want = [tuple(r) for r in json.load(f)]
    for engine in ("arrow", "jvm"):
        rows = full_pipeline(
            spark, transcripts_from_events(spark, sf_dir), PipelineOptions(engine=engine)
        ).collect()
        got = sorted(
            (r["route"], r["role"], r["tool"], r["hour"].isoformat(), r["n"]) for r in rows
        )
        assert got == want, f"{engine}: flagship counts drifted from golden"
