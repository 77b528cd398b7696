"""Iceberg sink seam: no runtime jar ships in this sandbox, so these
tests pin the DISPATCH semantics — which V2 writer verbs the seam uses —
via a fake writer. The parquet path's partitionOverwriteMode=dynamic
option does not exist for Iceberg; idempotent per-route replacement
must go through overwritePartitions(), with create-partitioned-by-route
on first write."""

from __future__ import annotations

import pytest
from pyspark.errors import AnalysisException

from log_formatter_spark.sinks.writer import write_routed


@pytest.fixture()
def routed_df(spark):
    return spark.createDataFrame(
        [(1, "sink_default"), (2, "sink_errors")], "id long, route string"
    )


class _FakeV2Writer:
    def __init__(self, calls, table_exists):
        self.calls = calls
        self.table_exists = table_exists

    def overwritePartitions(self):
        self.calls.append("overwritePartitions")
        if not self.table_exists:
            raise AnalysisException("[TABLE_OR_VIEW_NOT_FOUND] no such table")

    def partitionedBy(self, col):
        self.calls.append("partitionedBy(route)")
        return self

    def create(self):
        self.calls.append("create")


def _patch(monkeypatch, df, calls, table_exists):
    # Spark 4: instances are pyspark.sql.classic.dataframe.DataFrame, so
    # patch the concrete class, not the pyspark.sql facade
    monkeypatch.setattr(
        type(df), "writeTo", lambda self, t: _FakeV2Writer(calls, table_exists)
    )


def test_iceberg_existing_table_overwrites_partitions_only(
    monkeypatch, routed_df
):
    calls = []
    _patch(monkeypatch, routed_df, calls, table_exists=True)
    write_routed(routed_df, "catalog.db.routed", fmt="iceberg")
    assert calls == ["overwritePartitions"]


def test_iceberg_first_write_creates_partitioned_table(monkeypatch, routed_df):
    calls = []
    _patch(monkeypatch, routed_df, calls, table_exists=False)
    write_routed(routed_df, "catalog.db.routed", fmt="iceberg")
    assert calls == ["overwritePartitions", "partitionedBy(route)", "create"]


def test_parquet_path_untouched(routed_df, tmp_path):
    # the default format still writes dynamic-overwrite partitioned dirs
    out = str(tmp_path / "routed")
    write_routed(routed_df, out, fmt="parquet")
    spark = routed_df.sparkSession
    back = spark.read.parquet(out)
    assert {r["route"] for r in back.select("route").collect()} == {
        "sink_default",
        "sink_errors",
    }
