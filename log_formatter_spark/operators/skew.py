"""Partitioning & skew mitigation (north-rule requirement).

The pipeline partitions by hash(conv_id); hot conversations (FIXTURES.md
§1: ~1% of convs own ~30% of turns; bench generator: one conv owns 10%)
would make one task a straggler. Mitigations, both deterministic (no
``rand()`` — FIXTURES.md invariant: salt must be a pure function of row
keys so routed-row equality holds across reruns and cluster sizes):

1. ``salted_repartition`` — repartition on (conv_id, salt) where
   salt = pmod(xxhash64(conv_id, turn_idx), n_salts): spreads a hot
   conversation over n_salts tasks for per-row work (parse/enrich/route
   are row-local, so correctness is unaffected by the split).
2. ``salted_count`` — two-stage aggregation for per-conv_id aggregates:
   partial agg on (conv_id, salt), final agg on conv_id. The first
   stage shrinks the hot key by n_salts× before the key-only shuffle.

AQE skew-join/coalesce (session.py) is the runtime safety net on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salt_col(n_salts: int, *key_cols: str) -> Column:
    """Deterministic salt in [0, n_salts) from row keys (never rand())."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_salts)).cast("int")


def salted_repartition(
    df: DataFrame, num_partitions: int, n_salts: int = 16
) -> DataFrame:
    """hash(conv_id) partitioning with salted hot-key spreading."""
    return df.repartition(
        num_partitions, F.col("conv_id"), salt_col(n_salts, "conv_id", "turn_idx")
    )


def salted_count(df: DataFrame, key: str = "conv_id", n_salts: int = 16) -> DataFrame:
    """Two-stage skew-proof count per key; result equals plain
    groupBy(key).count() exactly (oracle-checkable)."""
    salted = df.groupBy(
        F.col(key), salt_col(n_salts, key, "turn_idx").alias("_salt")
    ).agg(F.count(F.lit(1)).alias("_partial"))
    return salted.groupBy(key).agg(F.sum("_partial").alias("n_turns"))


SKEW_TOP_K = 20


def _floor_div(a: Column, b: Column) -> Column:
    """Exact floor division for non-negative decimal(38,0) operands.

    Spark's ``div`` on decimals silently WRAPS through long (measured:
    10^22 div 3 returns a negative), and plain decimal ``/`` rounds
    half-up at the result scale — both wrong for an oracle-exact
    quotient. ``a % b`` on decimals is exact (BigDecimal remainder),
    so ``(a - a % b) / b`` divides exactly-divisible operands: the
    true quotient is an integer, the scale rounding is the identity,
    and the bigint cast is exact.
    """
    return ((a - a % b) / b).cast("bigint")


def key_skew_report(
    df: DataFrame,
    key: str = "conv_id",
    k: int = SKEW_TOP_K,
    salt_cols: tuple[str, ...] = ("turn_idx",),
    n_salts: int = 16,
) -> DataFrame:
    """Hot-key diagnosis for a join/aggregation key: the top-k heaviest
    keys with their exact corpus share and the salting factor that
    would level them — the report that decides *whether* a pipeline
    needs :func:`salted_repartition` and with how many salts
    (``salt_n`` = the hot key's row count measured in average-key
    units, i.e. how many average-sized pieces it must split into).

    Built skew-proof itself (diagnosing skew must not fall victim to
    it): per-key counts are the salted two-stage aggregation (hot keys
    partial-aggregate across ``n_salts`` sub-keys derived from
    ``salt_cols``, the :func:`salted_count` scheme generalized to any
    key — results are exactly plain groupBy counts), top-k is a
    TakeOrderedAndProject over the key-count frame — never a global
    sort — and the corpus totals (1 row) attach to the k-row result by
    union + an unpartitioned window over k+1 rows (a join would
    constant-fold into the banned BroadcastNestedLoopJoin; the window
    frame here is k+1 rows, not the 10^10-key count frame). The totals
    row is tagged with a dedicated boolean ``_marker`` column — never a
    NULL key — so a GENUINE NULL-key group (the archetypal hot key:
    every dropped/anonymous id collapses onto it) survives into the
    report instead of being filtered out with the marker. Non-string
    keys (``key_skew_report(events, key="user_id",
    salt_cols=("event_id",))``) work unchanged.

    share_ppm and salt_n are exact integer arithmetic in decimal(38,0)
    (n·n_keys exceeds int64 at corpus scale) via :func:`_floor_div`.
    Ties at rank k break on the key value with NULLS FIRST on both
    engines (Spark's ascending default; the oracle spells it) —
    deterministic at any parallelism.
    """
    salted = df.groupBy(
        F.col(key), salt_col(n_salts, key, *salt_cols).alias("_salt")
    ).agg(F.count(F.lit(1)).alias("_partial"))
    counts = salted.groupBy(key).agg(F.sum("_partial").alias("n_rows"))
    ktype = dict(counts.dtypes)[key]
    top = counts.orderBy(F.desc("n_rows"), F.col(key)).limit(k)
    tot = counts.agg(
        F.sum("n_rows").alias("_tot"), F.count(F.lit(1)).alias("_nk")
    ).select(
        F.lit(None).cast(ktype).alias(key),
        F.lit(None).cast("bigint").alias("n_rows"),
        "_tot",
        "_nk",
        F.lit(True).alias("_marker"),
    )
    u = top.select(
        key,
        "n_rows",
        F.lit(None).cast("bigint").alias("_tot"),
        F.lit(None).cast("bigint").alias("_nk"),
        F.lit(False).alias("_marker"),
    ).unionByName(tot)
    w = Window.partitionBy()
    dec = "decimal(38,0)"
    attached = (
        u.withColumn("total_rows", F.max("_tot").over(w))
        .withColumn("n_keys", F.max("_nk").over(w))
        .where(~F.col("_marker"))
    )
    n = F.col("n_rows").cast(dec)
    t = F.col("total_rows").cast(dec)
    nk = F.col("n_keys").cast(dec)
    one = F.lit(1).cast(dec)
    return attached.select(
        F.col(key),
        "n_rows",
        "total_rows",
        "n_keys",
        _floor_div(n * F.lit(1000000).cast(dec), t).alias("share_ppm"),
        _floor_div(n * nk + t - one, t).alias("salt_n"),
    )


def key_skew_report_sql(
    src_cte: str, key: str = "conv_id", k: int = SKEW_TOP_K
) -> str:
    """DuckDB rendering of :func:`key_skew_report` — HUGEINT plays
    decimal(38,0); `//` and `%` are exact on HUGEINT. Subquery form
    (no WITH) so it composes after an existing CTE chain."""
    return f"""
SELECT t.{key}, t.n_rows, g.total_rows, g.n_keys,
       CAST(CAST(t.n_rows AS HUGEINT) * 1000000
            // CAST(g.total_rows AS HUGEINT) AS BIGINT) AS share_ppm,
       CAST((CAST(t.n_rows AS HUGEINT) * CAST(g.n_keys AS HUGEINT)
             + CAST(g.total_rows AS HUGEINT) - 1)
            // CAST(g.total_rows AS HUGEINT) AS BIGINT) AS salt_n
FROM (
  SELECT {key}, CAST(count(*) AS BIGINT) AS n_rows
  FROM {src_cte} GROUP BY {key}
  ORDER BY n_rows DESC, {key} NULLS FIRST LIMIT {k}
) t, (
  SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM (
    SELECT CAST(count(*) AS BIGINT) AS n_rows
    FROM {src_cte} GROUP BY {key}
  )
) g
"""
