"""layout.zorder_key / zorder_layout: interleave arithmetic, rectangle
audit, and the pruning claim itself — checked against real parquet
footer statistics for a z-ordered vs a linear layout.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from log_formatter_spark.operators import layout


def _py_morton(x, y, bits=16):
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python(spark):
    pairs = [(0, 0), (1, 0), (0, 1), (7, 3), (255, 254), (65535, 65535)]
    df = spark.createDataFrame(pairs, "x long, y long").select(
        "x", "y", layout.zorder_key(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _py_morton(r["x"], r["y"]), (r["x"], r["y"])


def test_layout_audit_buckets_are_rectangles(spark, sf_dir):
    rows = layout.zorder_layout(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).collect()
    assert rows
    total = sum(r["n_rows"] for r in rows)
    assert total > 0
    for r in rows:
        assert 0 <= r["min_user"] <= r["max_user"] < 1 << layout.Z_BITS
        assert 0 <= r["min_hour"] <= r["max_hour"] < 1 << layout.Z_BITS


def _file_stats(path, col):
    """(min, max) of a column across each file's row groups."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins, maxs = [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(names[col]).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def _admitting(stats, lo, hi):
    return sum(1 for mn, mx in stats if not (mx < lo or mn > hi))


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = layout.normalized_dims(ev).withColumn(
        "z", layout.zorder_key(F.col("x"), F.col("y"))
    )
    root = tmp_path_factory.mktemp("zorder")
    lin = str(root / "linear")
    zo = str(root / "zorder")
    base.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(lin)
    base.repartitionByRange(8, "z").sortWithinPartitions("z").write.parquet(zo)
    spans = base.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).collect()[0]
    return lin, zo, spans


def test_zorder_prunes_both_dimensions(layouts):
    """The 100 TB claim itself: a 1/8-span predicate on EITHER column
    excludes files by footer min/max under z-order; the linear layout
    prunes only its sort column and reads every file for the other."""
    lin, zo, (x0, x1, y0, y1) = layouts
    # probe at the 1/8-span point with 1/16 width — mid-span would sit
    # exactly on the top-bit boundary every z-file straddles (the one
    # query window z-order is worst at)
    xw = max((x1 - x0) // 16, 1)
    yw = max((y1 - y0) // 16, 1)
    xq = (x0 + (x1 - x0) // 8, x0 + (x1 - x0) // 8 + xw)
    yq = (y0 + (y1 - y0) // 8, y0 + (y1 - y0) // 8 + yw)

    lin_x = _admitting(_file_stats(lin, "x"), *xq)
    lin_y = _admitting(_file_stats(lin, "y"), *yq)
    zo_x = _admitting(_file_stats(zo, "x"), *xq)
    zo_y = _admitting(_file_stats(zo, "y"), *yq)
    n_lin = len(_file_stats(lin, "x"))
    n_zo = len(_file_stats(zo, "x"))

    assert lin_x < n_lin          # linear prunes its own sort column…
    assert lin_y == n_lin         # …and nothing on the other dimension
    assert zo_x < n_zo            # z-order prunes BOTH
    assert zo_y < n_zo


def test_extreme_dims_cross_engine(spark, tmp_path):
    """Pre-1970 timestamps (true FLOOR hour index, not truncation) and
    snowflake-scale user_ids spanning > 2^47 (the regime where the raw
    int64 ``(v - min) * 2^bits`` multiply would overflow): the Spark
    operator and the DuckDB twin must agree exactly (ADVICE r4)."""
    import datetime as dt

    import duckdb

    rows = [
        (1 << 62, dt.datetime(1969, 12, 31, 22, 30)),
        (-(1 << 62), dt.datetime(1969, 12, 31, 23, 59, 59)),
        (0, dt.datetime(2024, 1, 1)),
        (123456789012345678, dt.datetime(1950, 6, 1, 12)),
        (None, dt.datetime(2024, 1, 1)),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    p = str(tmp_path / "ev.parquet")
    df.write.parquet(p)
    got = sorted(tuple(r) for r in layout.zorder_layout(df).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(layout.zorder_layout_sql()).fetchall())
    assert got == want
    # floor, not truncation: 22:30 the day before epoch is hour -2
    hours = {
        r[0]
        for r in df.where(F.col("ts").isNotNull())
        .selectExpr(layout._RAW_Y_EXPR + " as h")
        .collect()
    }
    assert -2 in hours
