"""Relational OLAP queries over the warehouse tables — the general
analytics surface around the log pipeline.

Three classic shapes (TPC-H Q1/Q3/Q5 style, adapted to the driver
testdata's columns), chosen to pin three distinct physical plans:

- ``pricing_summary``    : scan → filter → wide grouped aggregation.
  Everything partial-aggregates map-side; the exchange carries one row
  per (returnflag, linestatus) per task. The filter and the 7-column
  projection must reach the parquet scan (plan-tested).
- ``segment_top_orders`` : selective dim (customer segment) broadcast
  into a fact⋈fact shuffle join (orders⋈lineitem), grouped revenue,
  global top-N via TakeOrderedAndProject — the driver never sees more
  than N rows and no full sort materializes.
- ``regional_revenue``   : the join-graph query — lineitem⋈orders is the
  single shuffle join; supplier, customer, nation, region are all
  broadcast. The c_nationkey = s_nationkey condition rides on the
  broadcast join, so "customer and supplier in the same nation" never
  forms a cross product.

Float determinism follows the contract-wide policy (contract.py): the
per-row price expressions are IEEE double products evaluated in the
same order in both engines, summed as DECIMAL (order-independent exact
addition), cast back to double at the end — bit-identical results at
any parallelism, which is what lets the driver hash-match an
aggregation over 6M rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Revenue per row: each ATOMIC double is cast to decimal once (the
# source values carry 2 decimal digits, so the cast is far from any
# rounding boundary and both engines agree), then the product is EXACT
# decimal arithmetic — no double→decimal cast of a computed product,
# where Spark (half-up on the exact binary expansion) and DuckDB
# (nearest on the 10^s-scaled double) can round a midpoint differently.
_DISC_PRICE = (
    "(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4)))"
)
_CHARGE = (
    "(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4))"
    " * CAST(1.0 + l_tax AS DECIMAL(8,4)))"
)

PRICING_CUTOFF = "1998-12-01"
SEGMENT = "BUILDING"
SEGMENT_DATE = "1997-06-01"
REGION = "ASIA"
REGION_DATE_FROM = "1996-01-01"
REGION_DATE_TO = "1997-01-01"
TOP_ORDERS = 10


def pricing_summary(lineitem: DataFrame, cutoff: str = PRICING_CUTOFF) -> DataFrame:
    """Q1-style pricing summary report."""
    li = lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    qty = F.col("l_quantity").cast("decimal(18,4)")
    base = F.col("l_extendedprice").cast("decimal(18,4)")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(base).cast("double").alias("sum_base_price"),
            F.sum(F.expr(_DISC_PRICE)).cast("double").alias("sum_disc_price"),
            F.sum(F.expr(_CHARGE)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n.cast("double")).alias("avg_qty"),
            (F.sum(base).cast("double") / n.cast("double")).alias("avg_price"),
            n.alias("count_order"),
        )
    )


def _dec2dbl(expr: str) -> str:
    """DuckDB decimal→double via the exact string form: DuckDB's direct
    cast divides the int128 by 10^scale in double arithmetic, which
    double-rounds once |sum·10^scale| > 2^53; varchar→double is a single
    correctly-rounded conversion, matching Spark's BigDecimal path."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def pricing_summary_sql(src: str = "lineitem", cutoff: str = PRICING_CUTOFF) -> str:
    sum_qty = _dec2dbl("sum(CAST(l_quantity AS DECIMAL(18,4)))")
    sum_base = _dec2dbl("sum(CAST(l_extendedprice AS DECIMAL(18,4)))")
    return f"""
SELECT l_returnflag, l_linestatus,
       {sum_qty} AS sum_qty,
       {sum_base} AS sum_base_price,
       {_dec2dbl(f"sum({_DISC_PRICE})")} AS sum_disc_price,
       {_dec2dbl(f"sum({_CHARGE})")} AS sum_charge,
       {sum_qty} / CAST(count(*) AS DOUBLE) AS avg_qty,
       {sum_base} / CAST(count(*) AS DOUBLE) AS avg_price,
       count(*) AS count_order
FROM {src}
WHERE l_shipdate <= TIMESTAMP '{cutoff}'
GROUP BY l_returnflag, l_linestatus
"""


def segment_top_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = SEGMENT,
    date: str = SEGMENT_DATE,
    limit: int = TOP_ORDERS,
) -> DataFrame:
    """Q3-style: top unshipped orders by revenue for one market segment.

    customer (filtered to one segment) is explicitly broadcast; the only
    shuffle join is lineitem⋈orders on the orderkey.
    """
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.where(F.col("o_orderdate") < F.lit(date).cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.where(F.col("l_shipdate") > F.lit(date).cast("timestamp")).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    return (
        j.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(limit)
    )


def segment_top_orders_sql(
    segment: str = SEGMENT, date: str = SEGMENT_DATE, limit: int = TOP_ORDERS
) -> str:
    return f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       {_dec2dbl(f"sum({_DISC_PRICE})")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{date}'
  AND l_shipdate > TIMESTAMP '{date}'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey LIMIT {limit}
"""


def regional_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = REGION,
    date_from: str = REGION_DATE_FROM,
    date_to: str = REGION_DATE_TO,
) -> DataFrame:
    """Q5-style: per-nation revenue where customer and supplier share the
    nation, for one region and one order-date year.

    Join graph: the fact⋈fact lineitem⋈orders shuffle join is the spine;
    supplier, customer and the nation⋈region dim chain are broadcast.
    """
    nr = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    s = supplier.select("s_suppkey", "s_nationkey")
    c = customer.select("c_custkey", "c_nationkey")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey)
    )
    return j.groupBy("n_name").agg(
        F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue")
    )


def regional_revenue_sql(
    region_name: str = REGION,
    date_from: str = REGION_DATE_FROM,
    date_to: str = REGION_DATE_TO,
) -> str:
    return f"""
SELECT n_name, {_dec2dbl(f"sum({_DISC_PRICE})")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{region_name}'
  AND o_orderdate >= TIMESTAMP '{date_from}'
  AND o_orderdate < TIMESTAMP '{date_to}'
GROUP BY n_name
"""
