"""Watermarked stream-stream joins — the last Structured Streaming
join class this engine exercises (the others: stream-static probe in
streaming/dedup.py, stateful aggregation, session windows,
dropDuplicatesWithinWatermark).

A stream-stream join is the only way to correlate two UNBOUNDED inputs
(clicks and purchases both arriving live) without landing one of them
first: each side buffers rows in state, matches fire as the partner
arrives, and the WATERMARK + the join's time-range constraint bound how
long state is held — without both, state grows forever; with them,
Spark evicts a buffered row as soon as no future partner can match it
(the range gives the eviction horizon, the watermark gives "future").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    lookback_hours: int = 1,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of ``operators.asof.attribution_window``: every
    click inside each purchase's trailing lookback window, both sides
    unbounded streams — (user_id, purchase_id, purchase_ts, click_id,
    click_ts, gap_us).

    State bound: a buffered click can only match purchases with
    ``purchase_ts ∈ [click_ts, click_ts + lookback]``, so once the
    purchase-side watermark passes ``click_ts + lookback`` the click
    evicts; purchases evict symmetrically. State is (arrival rate ×
    (lookback + watermark delay)) — independent of stream length, the
    property that lets this run forever at 10^12 events. Inner join in
    append mode: every emitted row is final (no retractions), and the
    emitted SET is deterministic at any micro-batch slicing — which is
    what lets the driver hash the final table against the batch theta
    oracle (`attribution_window_sql`).
    """
    # watermarks require TIMESTAMP (LTZ); transcript/event tables carry
    # TIMESTAMP_NTZ — the cast is value-identity under the UTC session,
    # and outputs cast back so the schema matches the batch twin
    def _side(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "ts", F.col("ts").cast("timestamp_ltz")
        ).withWatermark("ts", watermark)

    t = _side(touches).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    c = _side(conversions).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = t.join(
        c,
        F.expr(
            f"""
            t_user = c_user AND
            click_ts BETWEEN purchase_ts - INTERVAL {lookback_hours} HOURS
                         AND purchase_ts
            """
        ),
    )
    gap = F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts"))
    return joined.select(
        F.col("t_user").alias("user_id"),
        "purchase_id",
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "click_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        gap.alias("gap_us"),
    )
