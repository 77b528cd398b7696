#!/usr/bin/env python
"""Parallelism-sensitivity audit: run EVERY contract query under a
deliberately odd execution config (default 3 cores, 5 shuffle
partitions — nothing divides anything) and compare against the DuckDB
oracle with the driver-strict rowset rules.

Why this exists: the per-query determinism arguments (array_sort
canonicalization, order-free integer sums, pinned fold order,
total-order window tiebreaks) each hold locally, but the catalog only
stays hash-exact if EVERY query got its argument right — and the
drivers/CI may run any parallelism. A mismatch here is a hidden
ordering dependence that the fixed-config replica can't see. Last run:
100/100 clean (2026-08-18, see BENCH.md).

Usage: PYTHONPATH=/root/repo:/root/repo/tests python scripts/parallelism_audit.py \
           [sf_dir] [cores] [shuffle_partitions]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import duckdb

from log_formatter_spark import contract
from log_formatter_spark.session import get_spark
from test_contract import TABLES, _pd_rowset


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("parallelism-audit", cores=cores, shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, oracles = contract.queries(), contract.oracle_sql()
    only = os.environ.get("SPARK_GRAFT_AUDIT_QUERIES")
    if only:  # comma-separated subset, same knob shape as sweep_scaled
        keep = {q.strip() for q in only.split(",") if q.strip()}
        qs = {k: v for k, v in qs.items() if k in keep}
    bad: list[str] = []
    for name in qs:
        try:
            sc, sr = _pd_rowset(qs[name](spark, sf).toPandas())
            dc, dr = _pd_rowset(con.execute(oracles[name]).df())
            ok = sc == dc and sr == dr
        except Exception as e:  # noqa: BLE001 — audit must keep sweeping
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:150]}", flush=True)
            bad.append(name)
            continue
        print(("ok " if ok else "MISMATCH ") + name, flush=True)
        if not ok:
            bad.append(name)
    print(f"audit: {len(qs) - len(bad)}/{len(qs)} clean at cores={cores} parts={parts}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
