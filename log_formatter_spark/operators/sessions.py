"""Conversation sessionization — gap-based session windows over turns.

A log/transcript-analytics staple the reference cannot express (no
state, no windows — SURVEY.md §2.5): split each conversation into
sessions separated by ≥``gap`` of inactivity, and aggregate per
session.

Two renderings with identical results:

- **Batch** (``conversation_sessions``): gaps-and-islands — lag() to
  detect session starts, running sum to number sessions, then a hash
  aggregate. Both shuffles key on conv_id (window + final group share
  the partitioning; Catalyst reuses the exchange), so at 10^12 turns
  the cost is one conv_id exchange + per-partition sort. Fully
  SQL-expressible → DuckDB oracle.
- **Streaming** (``streaming_sessions``): Spark's native
  ``session_window`` with a watermark — state-store-backed merging
  session windows, the idiomatic Structured Streaming form (preferred
  over applyInPandasWithState since the built-in covers these
  semantics exactly).

Timestamps are ntz; ``prev + INTERVAL`` comparison is wall-clock
arithmetic in both engines, independent of session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP = "30 minutes"


def numbered_sessions(transcripts: DataFrame, gap: str = DEFAULT_GAP) -> DataFrame:
    """Turn-level session numbering: (conv_id, turn_idx, ts, sess_id) —
    the gaps-and-islands intermediate, exposed so downstream operators
    (temporal_split at session granularity, per-session packing) can
    key on the session without re-deriving the window."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int")
        .alias("sess_id"),
    )


def conversation_sessions(
    transcripts: DataFrame, gap: str = DEFAULT_GAP
) -> DataFrame:
    """(conv_id, sess_id, session_start, session_end, n_turns)."""
    numbered = numbered_sessions(transcripts, gap)
    return numbered.groupBy("conv_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_turns"),
    )


def numbered_sessions_sql(
    transcripts_cte: str = "transcripts", gap: str = DEFAULT_GAP
) -> str:
    return f"""
SELECT conv_id, turn_idx, ts,
       CAST(sum(new_sess) OVER (PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS sess_id
FROM (
  SELECT conv_id, turn_idx, ts,
         CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL {gap}
              THEN 1 ELSE 0 END AS new_sess
  FROM (
    SELECT conv_id, turn_idx, ts,
           lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_ts
    FROM {transcripts_cte}
  )
)"""


def conversation_sessions_sql(
    transcripts_cte: str = "transcripts", gap: str = DEFAULT_GAP
) -> str:
    return f"""
SELECT conv_id, sess_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_turns
FROM ({numbered_sessions_sql(transcripts_cte, gap)})
GROUP BY conv_id, sess_id
"""


def streaming_sessions(
    transcripts_stream: DataFrame,
    gap: str = DEFAULT_GAP,
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session-window aggregation for the unbounded stream."""
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("conv_id"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )
