"""SparkSession factory with scale-oriented defaults.

Single place where execution knobs live so tests, bench and the driver
contract agree. The reference engine's parallelism knobs (``pipeline.worker``,
``input.kafka.worker`` — reference agent/pipeline/pipeline.go:27,
agent/input/kafka/kafka.go:33) map to core count / shuffle partitions here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "log-formatter-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    - AQE on (coalesce + skew-join): runtime re-planning is our first line
      of skew defense; explicit salting (operators/skew.py) is the second.
    - Arrow on: the grok parser is a vectorized pandas UDF (no per-row
      Python, per the north rule).
    - UTC session timezone: keeps timestamp rendering identical between
      Spark and the DuckDB oracle over the same parquet files.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = os.environ.get(
        "SPARK_GRAFT_MASTER", f"local[{cores}]" if cores else "local[*]"
    )
    if shuffle_partitions is None:
        n = cores or os.cpu_count() or 8
        shuffle_partitions = max(8, n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces post-shuffle stages by BYTES, but several hot
        # stages here are digest-dense, not byte-dense: minhash
        # signatures over a groupBy-assembled conversation corpus carry
        # ~6 MD5s per character of text, so the default 1 MB floor
        # packed 36M digests into 2 tasks at 32 cores. A 64 KB floor
        # keeps such stages at full parallelism (capped by
        # spark.sql.shuffle.partitions, so task counts cannot explode)
        # and is inert at cluster scale, where post-shuffle partitions
        # exceed the advisory size anyway. Measured: conv_neardup
        # 10.1 s -> 3.5 s at sf0.1/32 cores; map/agg controls neutral
        # (min-of-5: 4.32 s -> 4.11 s over nine sub-second entries).
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # G1 with a relaxed pause goal: this pipeline allocates strings at
        # a high rate (regex extraction); measured 27% faster at 32 cores
        # than default GC settings, neutral at low core counts. NOTE: a
        # *larger* heap is slower here — 8g beat 40g by 2.6x at 32 threads
        # (GC copy cost tracks live-set locality, not heap headroom).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UseG1GC -XX:MaxGCPauseMillis=500",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
