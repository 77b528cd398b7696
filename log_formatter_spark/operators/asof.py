"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

Semantics: for each left row, attach the columns of the latest right row
with the same key and ``right.ts <= left.ts`` (inclusive), or nulls when
no such row exists (left-outer as-of). This is the standard
point-in-time enrichment primitive: "state as of the event" — last
config change before a log line, last price before a trade, last click
before a purchase.

The reference has no as-of operator (its enrich stage is equality-keyed
lookup only); this extends SURVEY.md §2.5's enrich family to temporal
keys, which a transcript pipeline needs the moment lookup tables become
slowly-changing (per-conversation model/config switches mid-stream).

100 TB plan — the union trick, NOT a range join:
  tag left/right, unionByName, one window over (key) ordered by
  (ts, side, right-row tiebreak), ``last(col, ignorenulls=True)`` up to
  the current row, keep left rows.
The whole operator is ONE hash exchange on the key plus a per-partition
sort — the same cost as the groupBy it replaces. The naive alternative
(range-condition join + per-left-row max) is a quadratic blowup per hot
key and needs a second aggregation; the window form is linear in
``|left| + |right|`` after the shuffle and AQE's skew-split still
applies to the exchange. Right rows sort BEFORE left rows at equal ts
(side 0 < 1), which is exactly the inclusive `<=` bound; equal-ts right
rows are ordered by the tiebreak column so the winner is deterministic
at any parallelism (last one in sort order wins, matching DuckDB's
``ASOF JOIN`` picking the maximal right key).

The DuckDB oracle (`asof_join_sql` fragment builders in contract.py)
runs a native ``ASOF LEFT JOIN`` — a genuinely different algorithm
(per-key binary search) whose agreement with the window plan is the
strongest correctness evidence the driver can record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "lfs_asof_side_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left-outer as-of join: latest right row per key at-or-before
    each left row's ``ts_col``.

    ``value_cols``  right columns to carry (default: everything except
                    the key and ``ts_col``); each lands on the output as
                    ``{prefix}{name}``, plus ``{prefix}{ts_col}`` for the
                    matched right timestamp.
    ``tiebreak_col``right column ordering equal-ts right rows (the
                    maximal value wins, mirroring ASOF JOIN's maximal-key
                    match); required for determinism if the right side
                    can hold duplicate (key, ts) pairs.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, ts_col)]
    carried = [ts_col] + [c for c in value_cols if c != ts_col]
    if tiebreak_col is not None and tiebreak_col not in carried:
        carried.append(tiebreak_col)
    payload = "lfs_asof_row_"

    # A right row with NULL ts can never satisfy "at or before" —
    # Spark's nulls-first ascending sort would otherwise place it ahead
    # of everything and last(ignorenulls) would hand it to every
    # unmatched left row (DuckDB's ASOF JOIN never matches NULL ts).
    # NULL join keys likewise never match under SQL equality, but
    # Window.partitionBy groups NULL keys into one partition — so a
    # null-key right row would wrongly serve null-key left rows
    # (ADVICE r2). Dropping them gives null-key left rows the correct
    # no-match nulls.
    right = right.where(F.col(ts_col).isNotNull())
    for k in keys:
        right = right.where(F.col(k).isNotNull())

    # All right columns travel as ONE struct: last(..., ignorenulls) then
    # skips left rows (null struct) but never skips a right row whose
    # member column is null — a per-column last() would stitch values
    # from different right rows together.
    lhs = left.withColumn(_SIDE, F.lit(1))
    rhs = right.select(
        *keys,
        F.col(ts_col),
        F.struct(*[F.col(c).alias(c) for c in carried]).alias(payload),
        F.lit(0).alias(_SIDE),
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    order = [F.col(ts_col).asc(), F.col(_SIDE).asc()]
    if tiebreak_col is not None:
        # right rows only; null on left rows, harmless in the ordering
        order.append(F.col(payload).getField(tiebreak_col).asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(payload, ignorenulls=True).over(w)
    filled = unioned.select(
        *[c for c in left.columns],
        F.col(_SIDE),
        *[matched.getField(c).alias(f"{prefix}{c}") for c in carried],
    )
    return filled.where(F.col(_SIDE) == 1).drop(_SIDE)
