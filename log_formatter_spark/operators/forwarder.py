"""Identity formatter (reference agent/pipeline/forwarder/forwarder.go:19-21).

Exists so config-driven chains can include a no-op stage, exactly like
the reference's default pipeline. Catalyst elides it entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def forwarder(df: DataFrame) -> DataFrame:
    return df
