"""log_formatter_spark — a PySpark-native log/transcript pipeline engine.

A from-scratch rebuild of the *capabilities* of VertexC/log-formatter
(reference: /root/reference, a Go channel-pipelined Logstash clone) as an
idiomatic Spark DataFrame / Structured Streaming engine:

    parse (grok/regex, Arrow-vectorized)
      -> enrich (broadcast lookup joins)
      -> route (conditional fan-out to per-sink tables)
      -> aggregate (per-sink hash aggregates by role/tool/hour)

The reference's data model is a schemaless ``map[string]interface{}`` doc
flowing through bounded channels (reference agent/connector/queue.go:18);
here the doc is a typed Row in a DataFrame and the channel hops are Spark
stage boundaries. See SURVEY.md for the full mapping.
"""

from log_formatter_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
