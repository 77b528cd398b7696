#!/usr/bin/env python
"""Scaled-corpus regression sweep (BENCH.md §10-11 infrastructure).

Runs the bench HEADLINE queries single-shot against one or more scaled
corpora (built by make_scaled_testdata.py) and prints one JSON line per
corpus — the per-round artifact BENCH.md's scaling-verdict table diffs
against, so super-linear regressions surface automatically each round.

Usage:
  PYTHONPATH=/root/repo python scripts/sweep_scaled.py [dir ...]
    default dirs: /root/testdata/sf0.1 /tmp/lfs_sf1 /tmp/lfs_sf10
  SPARK_GRAFT_SWEEP_QUERIES=q1,q2  limit to named queries
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_OVERRIDES, HEADLINE  # noqa: E402
from log_formatter_spark import contract, get_spark  # noqa: E402


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/lfs_sf1",
        "/tmp/lfs_sf10",
    ]
    only = os.environ.get("SPARK_GRAFT_SWEEP_QUERIES")
    names = only.split(",") if only else HEADLINE
    spark = get_spark("lfs-sweep", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    qs = contract.queries()
    for d in dirs:
        if not os.path.isdir(d):
            print(json.dumps({"dir": d, "error": "missing"}))
            continue
        # per-corpus warm-up: one untimed scan of each table so the
        # first TIMED query doesn't absorb page-cache + codegen warm-up
        # (it skewed incremental_dedup's 10× reading in BENCH §18)
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                try:
                    spark.read.parquet(os.path.join(d, f)).write.format(
                        "noop"
                    ).mode("overwrite").save()
                except Exception:
                    pass
        times: dict[str, float] = {}
        for name in names:
            build = BENCH_OVERRIDES.get(name) or qs[name]
            t0 = time.time()
            try:
                build(spark, d).write.format("noop").mode("overwrite").save()
                times[name] = round(time.time() - t0, 2)
            except Exception as e:  # keep sweeping; record the failure
                times[name] = -1.0
                print(f"# {name} @ {d}: {type(e).__name__}: {e}", file=sys.stderr)
        print(json.dumps({"dir": d, "queries": times}), flush=True)


if __name__ == "__main__":
    main()
