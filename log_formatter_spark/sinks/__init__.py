"""Sink layer — the Spark rendering of the reference's output registry
(console/kafka/elasticsearch, reference agent/output/output.go:52-70)."""

from log_formatter_spark.sinks.writer import (
    write_routed,
    sink_path,
    read_sink,
    SINKS,
    register_sink,
)

__all__ = ["write_routed", "sink_path", "read_sink", "SINKS", "register_sink"]
