"""Source layer — the Spark rendering of the reference's input registry
(console/kafka/elasticsearch, reference agent/include/list.go:4-16)."""

from log_formatter_spark.sources.readers import SOURCES, register_source, build_source

__all__ = ["SOURCES", "register_source", "build_source"]
