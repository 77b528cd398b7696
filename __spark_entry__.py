"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The catalog itself lives in ``log_formatter_spark.contract`` so the
test suite exercises the exact pairs the driver grades
(tests/test_contract.py replicates the comparison locally).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from log_formatter_spark import contract
from log_formatter_spark.pipeline import full_pipeline
from log_formatter_spark.transcripts import transcripts_from_events


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the north-rule parse → enrich → route → aggregate
    DAG over transcripts derived from the sf0.001 events table."""
    t = transcripts_from_events(spark, "/root/testdata/sf0.001")
    return full_pipeline(spark, t)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
