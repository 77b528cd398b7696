"""Local replica of the driver's correctness gate.

For every (queries(), oracle_sql()) pair: run the Spark plan and the
DuckDB SQL over the same parquet dir, sort columns by name and rows by
value, and require EXACT equality — the driver's value-hash comparison
will only pass if this does. Floats are compared bit-exact on purpose:
the whole contract is designed so both engines produce identical IEEE
results (see contract.py docstring).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from log_formatter_spark import contract

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return val
    if hasattr(val, "isoformat"):  # datetime/date: tz-naive text form
        return val.replace(tzinfo=None).isoformat() if getattr(val, "tzinfo", None) else val.isoformat()
    if isinstance(val, bool):
        return bool(val)
    try:  # Decimal and numpy scalars -> python
        import numpy as np

        if isinstance(val, np.generic):
            return _canon(val.item())
    except ImportError:
        pass
    from decimal import Decimal

    if isinstance(val, Decimal):
        return float(val)
    return val


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_canon(r[i]) for i in order))
    return sorted(cols), sorted(out, key=repr)


# rows-only queries (no SQL-expressible oracle) are excluded from the
# value-hash comparison; the driver records a weaker rows/schema check
QUERIES = sorted(set(contract.queries()) & set(contract.oracle_sql()))


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = contract.queries()[name]
    sql = contract.oracle_sql()[name]
    sdf = q(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    sc, sr = _rowset(scols, srows)
    dc, dr = _rowset(dcols, drows)
    assert sc == dc, f"{name}: column names differ: {sc} vs {dc}"
    assert len(sr) == len(dr), f"{name}: row counts differ: {len(sr)} vs {len(dr)}"
    mismatches = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={sr[mismatches[0]]} duck={dr[mismatches[0]]}"
    )


# every contract query now carries a full SQL oracle (round 2: the
# formerly rows-only multimodal_decode was made hashable + oracled)
ROWS_ONLY: set[str] = set()


def test_oracle_coverage():
    qs, os_ = set(contract.queries()), set(contract.oracle_sql())
    assert os_ <= qs, f"oracles without queries: {os_ - qs}"
    assert qs - os_ == ROWS_ONLY, f"unexpected rows-only queries: {qs - os_ - ROWS_ONLY}"


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
