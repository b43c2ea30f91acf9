"""General OLAP analytics over the TPC-H-shaped base tables.

The engine's §2 surface is storage-domain; these operators prove the
same Spark-first machinery runs classic warehouse shapes (multi-way
dimension joins + grouped rollups — TPC-H Q3/Q5 patterns) with the
plans you'd want at 100 TB:

- dimension tables (region/nation/customer/supplier) broadcast; the only
  shuffles touch fact-table keys (orders → lineitem join, final groupBy);
- revenue carried as INTEGER CENTS: ``round(price·(1−discount)·100)``
  is computed per row (both engines execute the identical IEEE double
  product before the round) and summed as longs — distributed float
  summation would be partition-order-dependent and can't hash-match an
  oracle, integer sums can;
- date predicates push into the parquet scan before any join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _revenue_cents() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")


def unshipped_order_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k orders by open revenue — ordered before the
    cutoff, with lines still shipping after it, for one market segment.
    customer (filtered, tiny) broadcasts into orders; the only real
    shuffle is lineitem→orders and the per-order aggregation."""
    cut = F.to_timestamp(F.lit(cutoff))
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    lines = lineitem.filter(F.col("l_shipdate") > cut).select(
        "l_orderkey", _revenue_cents().alias("_rev")
    )
    return (
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(lines, ords.o_orderkey == lines.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("_rev").alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def regional_nation_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: per-nation revenue where the supplier and the
    customer share the nation, for one region and one order-date year.
    All four dimension inputs collapse to broadcasts; the fact-side plan
    is orders⋈lineitem (one key shuffle) then the tiny nation groupBy."""
    lo, hi = F.to_timestamp(F.lit(date_from)), F.to_timestamp(F.lit(date_to))
    nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation.n_regionkey == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(nations), customer.c_nationkey == nations.n_nationkey
    ).select("c_custkey", F.col("n_nationkey").alias("_c_nat"), "n_name")
    supp = supplier.select("s_suppkey", F.col("s_nationkey").alias("_s_nat"))
    ords = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    ).select("o_orderkey", "o_custkey")
    lines = lineitem.select(
        "l_orderkey", "l_suppkey", _revenue_cents().alias("_rev")
    )
    return (
        lines.join(ords, lines.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), lines.l_suppkey == supp.s_suppkey)
        .filter(F.col("_c_nat") == F.col("_s_nat"))
        .groupBy("n_name")
        .agg(F.sum("_rev").alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("n_name").asc())
    )


def pricing_summary(
    lineitem: DataFrame,
    ship_before: str = "1998-12-01",
) -> DataFrame:
    """TPC-H Q1 shape: the one-scan grouped pricing rollup. Every
    aggregate is map-side partial over integer-exact inputs (quantities
    are integral doubles → longs; money in rounded cents; charge =
    price·(1−disc)·(1+tax) rounded per row). Averages are left to the
    consumer (sums + count) — a distributed float mean is
    partition-order-dependent, sums and counts are not."""
    cut = F.to_timestamp(F.lit(ship_before))
    charge = F.round(
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
        * 100
    ).cast("long")
    return (
        lineitem.filter(F.col("l_shipdate") <= cut)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_base_cents"
            ),
            F.sum(_revenue_cents()).alias("sum_disc_cents"),
            F.sum(charge).alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def orders_above_customer_average(orders: DataFrame) -> DataFrame:
    """Decorrelated "above my customer's average" filter — the classic
    correlated subquery (``o_totalprice > (SELECT avg(...) WHERE same
    customer)``) rewritten as one aggregate + a join back, with the
    comparison cross-multiplied into integers: keep order iff
    ``price_cents · n > sum_cents`` — no division, no float average, so
    the cut is engine-exact even for customers whose average lands
    exactly on an order's price. Two shuffles total (per-customer agg,
    join back on the customer key); the agg side is one row per
    customer, broadcastable when the customer dimension fits."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = (
        orders.select("o_custkey", cents.alias("_c"))
        .groupBy("o_custkey")
        .agg(F.sum("_c").alias("_sum"), F.count(F.lit(1)).alias("_n"))
    )
    return (
        orders.withColumn("_c", cents)
        .join(per_cust, "o_custkey")
        .filter(F.col("_c") * F.col("_n") > F.col("_sum"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("_c").alias("totalprice_cents"),
            F.col("_n").alias("n_orders"),
        )
    )
