"""Config-as-data planner: YAML pipeline spec → DataFrame DAG."""

from log_formatter_spark.plans.planner import (
    load_config,
    build_pipeline,
    run_batch,
    FORMATTERS,
    register_formatter,
)

__all__ = [
    "load_config",
    "build_pipeline",
    "run_batch",
    "FORMATTERS",
    "register_formatter",
]
