"""Operator library — the Spark rendering of the reference's formatter
registry (reference agent/pipeline/formatter.go:16-36). Each operator is a
function ``DataFrame -> DataFrame`` suitable for ``df.transform``; the
planner (plans/planner.py) chains them in config order, exactly like the
reference's ordered ``formatters:`` list
(agent/pipeline/pipeline.go:81-98,158-167) — except Catalyst fuses the
chain into one codegen stage instead of running it row-at-a-time.
"""

from log_formatter_spark.operators.parser import ParserConfig, LabelRule, apply_parser
from log_formatter_spark.operators.filter import apply_filter
from log_formatter_spark.operators.forwarder import forwarder
from log_formatter_spark.operators.labels import stamp_labels
from log_formatter_spark.operators.enrich import enrich
from log_formatter_spark.operators.route import add_route, DEFAULT_ROUTES
from log_formatter_spark.operators.ordering import with_turn_order, canonical_order
from log_formatter_spark.operators.aggregate import sink_aggregates
from log_formatter_spark.operators.skew import salted_repartition, salted_count

__all__ = [
    "ParserConfig",
    "LabelRule",
    "apply_parser",
    "apply_filter",
    "forwarder",
    "stamp_labels",
    "enrich",
    "add_route",
    "DEFAULT_ROUTES",
    "with_turn_order",
    "canonical_order",
    "sink_aggregates",
    "salted_repartition",
    "salted_count",
]
