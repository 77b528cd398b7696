"""Static label stamping.

Reference: after the formatter chain the worker writes static ``labels``
k→v into every surviving doc (agent/pipeline/pipeline.go:169-171; the
config plumbing was an unfinished TODO at pipeline.go:20 — we implement
the intended semantic). Spark rendering: one ``lit`` column per label,
constant-folded into the projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stamp_labels(df: DataFrame, labels: dict[str, str]) -> DataFrame:
    return df.withColumns({k: F.lit(v) for k, v in labels.items()})
