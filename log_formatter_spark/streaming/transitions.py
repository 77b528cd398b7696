"""Stateful streaming tool-handoff extraction: the continuous twin of
``transcripts.tool_pairs`` / ``tool_transitions``.

A transition is a property of two CONSECUTIVE turns, so a pair that
straddles a micro-batch boundary exists in neither batch alone —
exactly the shape the built-in streaming operators cannot express and
``applyInPandasWithState`` exists for: per-conversation state carries
the last seen tool (and its turn index) across triggers, so the
boundary pair is emitted when its second half arrives.

Ordering contract: turns of one conversation must arrive in
non-decreasing ``turn_idx`` order ACROSS triggers (within a trigger the
group sorts itself). That is the delivery guarantee of the reference's
kafka source — a topic partitioned by conv_id preserves per-key order —
and of any log-tailing file source; it is asserted per batch (a
violation raises rather than silently miscounting).

State size: one (tool, turn_idx) pair per LIVE conversation — bounded
by concurrent conversations, not history, which is what makes the
operator viable at 10^12 turns. Inside the pandas function everything
is vectorized (shift-style concatenation, no per-row Python loop).

Equivalence (the SIXTH streaming ≡ batch contract row): the emitted
pair stream, batch-aggregated, is row-identical to
``tool_transitions`` over the same input — the driver hashes it against
the SAME DuckDB oracle as the batch operator.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

PAIR_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("prev_tool", StringType()),
        StructField("tool", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_tool", StringType()),
        StructField("last_turn", IntegerType()),
    ]
)


def _emit_pairs(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    carry_tool, carry_turn = (
        state.get if state.exists else (None, None)
    )
    out = []
    for pdf in pdfs:
        if pdf.empty:
            continue
        pdf = pdf.sort_values("turn_idx")
        if carry_turn is not None and int(pdf["turn_idx"].iloc[0]) < carry_turn:
            raise ValueError(
                f"out-of-order delivery for {key[0]}: turn "
                f"{int(pdf['turn_idx'].iloc[0])} after {carry_turn}"
            )
        tools = pdf["tool"].tolist()
        prevs = [carry_tool] + tools[:-1]
        frame = pd.DataFrame(
            {"conv_id": key[0], "prev_tool": prevs, "tool": tools}
        )
        out.append(frame[frame["prev_tool"].notna()])
        carry_tool = tools[-1]
        carry_turn = int(pdf["turn_idx"].iloc[-1])
    if carry_tool is not None:
        state.update((carry_tool, carry_turn))
    if out:
        yield pd.concat(out, ignore_index=True)


def streaming_tool_pairs(stream: DataFrame) -> DataFrame:
    """Unbounded transcript stream → tool-handoff pair stream (append).

    NULL-tool turns are filtered before the stateful operator (the
    tool_pairs subsequence rule), so they neither emit nor break a
    transition AND never touch state.
    """
    src = stream.where(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "tool"
    )
    return src.groupBy("conv_id").applyInPandasWithState(
        _emit_pairs,
        outputStructType=PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# the batch aggregation is THE definition — re-exported so streaming
# callers aggregate the pair stream through the identical code path
from log_formatter_spark.transcripts import transition_counts  # noqa: E402,F401
