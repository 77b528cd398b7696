"""Custom stateful streaming operator: per-conversation state tracker.

Covers the one Structured Streaming shape the built-in operators can't
express (session_window handles gap aggregation, see
operators/sessions.py): arbitrary per-key state with TIMEOUT-DRIVEN
emission — "summarize a conversation once it has been idle past the
watermark". Built on ``applyInPandasWithState`` (Arrow-batched groups,
no per-row Python), the API the engine reserves for exactly this case.

Semantics: state per conv_id = (n_turns, n_errors, first_ts, last_ts),
folded incrementally across micro-batches. When the event-time
watermark passes last_ts + idle gap, the state times out and ONE
summary row is emitted, then the state is dropped — so state-store size
is bounded by the number of *live* conversations, not by history, which
is what makes the operator viable at 10^12 turns.

Determinism note (pinned in tests/test_stateful.py): with
Trigger.AvailableNow the final watermark is max(ts) - delay, so exactly
the conversations whose last turn is older than watermark - gap emit;
still-live conversations remain in the checkpointed state store and
emit on a later run — the same contract a continuous job provides.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEFAULT_IDLE_GAP_MS = 30 * 60 * 1000

STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("n_errors", LongType()),
        StructField("first_ts", LongType()),  # epoch ms
        StructField("last_ts", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("n_errors", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)


def track_conversations(
    transcripts_stream: DataFrame,
    idle_gap_ms: int = DEFAULT_IDLE_GAP_MS,
    watermark: str = "2 hours",
) -> DataFrame:
    """Emit one (conv_id, n_turns, n_errors, first_ts, last_ts) summary
    per conversation when it times out (idle past the watermark).

    The input needs ``conv_id``, ``ts`` and ``text``; a turn counts as
    an error when its text carries the ERROR level token (the same
    signal the router dead-letters on).
    """

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n_turns, n_errors, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [n_turns],
                    "n_errors": [n_errors],
                    "first_ts": [pd.Timestamp(first_ts, unit="ms")],
                    "last_ts": [pd.Timestamp(last_ts, unit="ms")],
                }
            )
            return
        n_turns, n_errors, first_ts, last_ts = (
            state.get if state.exists else (0, 0, None, None)
        )
        for pdf in pdfs:
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            n_turns += len(pdf)
            n_errors += int(pdf["text"].str.contains(" ERROR ", regex=False).sum())
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
        state.update((n_turns, n_errors, first_ts, last_ts))
        # a conversation can already be idle when first observed (its
        # desired timeout sits behind the watermark, which the API
        # rejects) — clamp forward so it fires at the next advance
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_ts + idle_gap_ms, wm + 1))
        return
        yield  # pragma: no cover — makes `update` a generator on all paths

    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
