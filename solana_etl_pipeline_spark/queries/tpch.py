"""Classic TPC-H-shaped queries over the star-schema fixtures —
the general-relational bench backbone (SURVEY.md §2.11).

Q1 (pricing summary), Q5 (local-supplier volume, 6-table join), and
Q6 (forecast revenue, pure scan-filter-agg) adapted to the fixture's
date range (1995-2001). These are the plans worth auditing at 100 TB:
Q6 must be a single scan with every predicate pushed; Q1 a one-shuffle
partial+final aggregate; Q5 broadcast its three dim tables and shuffle
only the two fact joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(revenue, 4).alias("revenue"))
    )


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional counts (CASE inside SUM) per group —
    line-status buckets by order priority class."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional-revenue ratio — promo share of revenue in
    a one-month window."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias(
                "promo_revenue_pct"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: outer-join aggregation histogram — customers bucketed
    by how many orders they have, INCLUDING zero (the left join keeps
    order-less customers; count(o_orderkey) ignores their nulls)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def tpch_q22_global_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q22 shape: scalar subquery (global average) + anti join
    (customers with no orders), expressed through the SQL API so
    Catalyst plans a real ScalarSubquery + anti join."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("c_q22")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("o_q22")
    return spark.sql(
        """
        SELECT c_nationkey,
               count(*) AS n_custs,
               round(sum(c_acctbal), 4) AS total_acctbal
        FROM c_q22 c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM c_q22
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM o_q22 o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_nationkey
        """
    )


QUERIES: dict[str, QuerySpec] = {
    "tpch_q1_pricing_summary": QuerySpec(
        spark=tpch_q1_pricing_summary,
        oracle="""
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4)
                     AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount)
                             * (1 + l_tax)), 4) AS sum_charge,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1999-09-02'
            GROUP BY 1, 2
        """,
        doc="TPC-H Q1 pricing summary (one-shuffle hash aggregate)",
        tags=("§2.11", "A1"),
    ),
    "tpch_q5_local_supplier_volume": QuerySpec(
        spark=tpch_q5_local_supplier_volume,
        oracle="""
            SELECT n.n_name, round(sum(l.l_extendedprice
                                       * (1 - l.l_discount)), 4) AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
                           AND c.c_nationkey = s.s_nationkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1
        """,
        doc="TPC-H Q5 six-table join, dims broadcast",
        tags=("§2.11", "J1"),
    ),
    "tpch_q6_forecast_revenue": QuerySpec(
        spark=tpch_q6_forecast_revenue,
        oracle="""
            SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.04 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        doc="TPC-H Q6 scan-filter-agg, all predicates pushed",
        tags=("§2.11", "P8"),
    ),
    "tpch_q12_shipmode_priority": QuerySpec(
        spark=tpch_q12_shipmode_priority,
        oracle="""
            SELECT l.l_linestatus,
                   CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1
        """,
        doc="TPC-H Q12 conditional counts per group",
        tags=("§2.11", "F12"),
    ),
    "tpch_q14_promo_revenue": QuerySpec(
        spark=tpch_q14_promo_revenue,
        oracle="""
            SELECT round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                             THEN l.l_extendedprice * (1 - l.l_discount)
                             ELSE 0.0 END)
                         / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
                     AS promo_revenue_pct,
                   count(*) AS n_items
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
              AND l.l_shipdate < TIMESTAMP '1996-04-01'
        """,
        doc="TPC-H Q14 conditional-revenue ratio",
        tags=("§2.11", "F9"),
    ),
    "tpch_q13_customer_distribution": QuerySpec(
        spark=tpch_q13_customer_distribution,
        oracle="""
            SELECT c_count, count(*) AS custdist
            FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                  FROM customer c
                  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                  GROUP BY c.c_custkey)
            GROUP BY c_count
        """,
        doc="TPC-H Q13 outer-join aggregation histogram (zero-order bucket)",
        tags=("§2.11",),
    ),
    "tpch_q22_global_sales_opportunity": QuerySpec(
        spark=tpch_q22_global_sales_opportunity,
        oracle="""
            SELECT c_nationkey, count(*) AS n_custs,
                   round(sum(c_acctbal), 4) AS total_acctbal
            FROM customer c
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0.0)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
            GROUP BY c_nationkey
        """,
        doc="TPC-H Q22 scalar subquery + anti join",
        tags=("§2.11",),
    ),
}
