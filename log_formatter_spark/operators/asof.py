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


# --- interval (window) join ---------------------------------------------------

_HOUR_US = 3_600_000_000


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_ts: str = "ts",
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_us: int = _HOUR_US,
) -> DataFrame:
    """Point-in-interval join — the other temporal join Spark's API
    lacks (``asof_join`` above gives the LATEST match; this gives ALL
    rows inside a window): inner-join each point row to every interval
    row with the same key and ``lo <= ts <= hi``. The ad-attribution /
    alert-correlation shape: all clicks inside each purchase's lookback
    window, all log lines inside each incident.

    100 TB plan — bucketed equality join, NOT a theta join: Catalyst
    plans a bare range predicate between two big tables as
    BroadcastNestedLoop/Cartesian (quadratic per key). Instead both
    sides map to integer time buckets — points to ONE bucket each,
    intervals EXPLODED to every bucket they overlap — and candidates
    form through a hash join on (key, bucket), with the exact
    ``lo <= ts <= hi`` containment as a post-filter. Work is
    Σ per-(key, bucket) |points|×|intervals| — bounded by bucket
    granularity and interval length, never |points|×|intervals| — and
    each interval explodes to ⌈len/bucket⌉+1 rows (lookback windows:
    usually 2). The same trick IS the standard distributed
    interval-join recipe (Flink's window join, AsterixDB's interval
    partition join). Bucket size trades explode factor against
    candidate density; ``bucket_us`` defaults to the 1-hour bucket the
    contract's 1-hour lookbacks explode to ≤2 rows.

    Timestamps compare as exact int64 µs (``unix_micros`` on the
    TIMESTAMP_NTZ→LTZ cast, UTC session = identity), so bucket edges
    and containment are engine-exact.
    """
    keys = [on] if isinstance(on, str) else list(on)
    p_us = F.unix_micros(F.col(point_ts).cast("timestamp_ltz"))
    lo_us = F.unix_micros(F.col(lo_col).cast("timestamp_ltz"))
    hi_us = F.unix_micros(F.col(hi_col).cast("timestamp_ltz"))
    p = points.where(F.col(point_ts).isNotNull()).withColumn(
        "_bucket", F.floor(p_us / F.lit(bucket_us))
    )
    iv = (
        intervals.where(F.col(lo_col).isNotNull() & F.col(hi_col).isNotNull())
        .where(lo_us <= hi_us)
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(lo_us / F.lit(bucket_us)),
                    F.floor(hi_us / F.lit(bucket_us)),
                )
            ),
        )
    )
    joined = p.join(iv, on=[*keys, "_bucket"]).where(
        (F.col(lo_col) <= F.col(point_ts)) & (F.col(point_ts) <= F.col(hi_col))
    )
    return joined.drop("_bucket")


def attribution_window(
    events: DataFrame,
    lookback_hours: int = 1,
    convert_type: str = "purchase",
    touch_type: str = "click",
) -> DataFrame:
    """All ``touch_type`` events inside each ``convert_type`` event's
    trailing lookback window, per user — the multi-touch attribution
    query (`asof_last_click` is its last-touch sibling):
    (purchase_id, purchase_ts, click_id, click_ts, gap_us)."""
    conv = events.where(F.col("event_type") == convert_type).select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        (F.col("ts") - F.expr(f"INTERVAL {lookback_hours} HOURS")).alias("lo"),
        F.col("ts").alias("hi"),
    )
    touch = events.where(F.col("event_type") == touch_type).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    out = interval_join(
        touch, conv, on="user_id", point_ts="click_ts", lo_col="lo", hi_col="hi"
    )
    gap = F.unix_micros(F.col("purchase_ts").cast("timestamp_ltz")) - F.unix_micros(
        F.col("click_ts").cast("timestamp_ltz")
    )
    return out.select(
        "user_id", "purchase_id", "purchase_ts", "click_id", "click_ts",
        gap.alias("gap_us"),
    )


def attribution_window_sql(
    src: str = "events",
    lookback_hours: int = 1,
    convert_type: str = "purchase",
    touch_type: str = "click",
) -> str:
    """Oracle: the plain theta join (different algorithm — DuckDB's IE
    join handles the range predicate natively; agreement with the
    bucketed plan is the correctness evidence)."""
    return f"""
SELECT c.user_id, c.event_id AS purchase_id, c.ts AS purchase_ts,
       t.event_id AS click_id, t.ts AS click_ts,
       epoch_us(c.ts) - epoch_us(t.ts) AS gap_us
FROM (SELECT * FROM {src} WHERE event_type = '{convert_type}') c
JOIN (SELECT * FROM {src} WHERE event_type = '{touch_type}') t
  ON c.user_id = t.user_id
 AND t.ts BETWEEN c.ts - INTERVAL {lookback_hours} HOUR AND c.ts
"""
