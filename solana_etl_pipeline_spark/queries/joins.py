"""Join surface (SURVEY.md §2.3 J1-J3 + §2.11 general joins).

The reference has no general join operator — its three join-shaped
computations are a dict-lookup enrich (``streamlit 1.3.txt:79-81``), an
anti-membership skip (``my_websocket.py:101-105``), and a struct carry
(``clean_data.py:86-101``). Here each becomes a real relational join
over the TPC-H-ish fixtures, plus the general equi/semi/theta surface
the engine must expose (SURVEY §2.11).

Scale posture: dimension tables (region/nation/supplier) are broadcast
explicitly — at 100 TB the fact side never shuffles for these joins;
the multi-table fact join relies on AQE for join reordering and skew
splitting. Plans verified via .explain: J1 is a BroadcastHashJoin, the
anti join is a BroadcastHashJoin(LeftAnti), the fact join shuffles only
on its join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table


def join_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: enrich facts from a small dim via broadcast join, default on
    miss (reference ``token_dict.get(x, "Unknown")``,
    ``streamlit 1.3.txt:79-81``). Nation names not in region 0-2 play
    the role of lookup misses via a filtered dim."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") <= 2
    )
    enriched = customer.join(
        F.broadcast(nation),
        customer.c_nationkey == nation.n_nationkey,
        "left",
    ).withColumn("nation_name", F.coalesce(F.col("n_name"), F.lit("Unknown")))
    return enriched.groupBy("nation_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 4).alias("sum_acctbal"),
    )


def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left-anti join — customers with no orders (the reference's
    'skip already-processed' membership test, ``my_websocket.py:101-105``,
    as a set operation)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one open ('O') order,
    counted per market segment."""
    customer = load_table(spark, sf_dir, "customer")
    open_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return (
        customer.join(
            open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def join_fact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table fact join (TPC-H Q3 shape): customer ⋈ orders ⋈
    lineitem with a segment filter, revenue per order, top 10.

    Filters are pushed below the joins by Catalyst; the two fact-fact
    joins shuffle on their keys, and the final top-k compiles to
    TakeOrderedAndProject (no global sort).
    """
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.round(revenue, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: lineitems priced inside a part-relative band
    (equi key + inequality band — the general non-equi surface)."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cond = (
        (lineitem.l_partkey == part.p_partkey)
        & (lineitem.l_extendedprice >= part.p_retailprice * 2)
        & (lineitem.l_extendedprice < part.p_retailprice * 30)
    )
    return (
        lineitem.join(F.broadcast(part), cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
    )


QUERIES: dict[str, QuerySpec] = {
    "join_broadcast_lookup": QuerySpec(
        spark=join_broadcast_lookup,
        oracle="""
            SELECT coalesce(n.n_name, 'Unknown') AS nation_name,
                   count(*) AS n_customers,
                   round(sum(c.c_acctbal), 4) AS sum_acctbal
            FROM customer c
            LEFT JOIN (SELECT * FROM nation WHERE n_regionkey <= 2) n
              ON c.c_nationkey = n.n_nationkey
            GROUP BY 1
        """,
        doc="Broadcast dim lookup with miss-default (streamlit 1.3.txt:79-81)",
        tags=("J1", "D1"),
    ),
    "join_left_anti": QuerySpec(
        spark=join_left_anti,
        oracle="""
            SELECT c_custkey, c_name, c_mktsegment
            FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        doc="Left-anti membership join (my_websocket.py:101-105)",
        tags=("J2", "U3"),
    ),
    "join_left_semi": QuerySpec(
        spark=join_left_semi,
        oracle="""
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer c
            WHERE EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
            GROUP BY 1
        """,
        doc="Left-semi existence join",
        tags=("J2",),
    ),
    "join_fact_revenue": QuerySpec(
        spark=join_fact_revenue,
        oracle="""
            SELECT o.o_orderkey, o.o_orderpriority,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                     AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY 1, 2
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        doc="Multi-table fact join + top-k (TPC-H Q3 shape)",
        tags=("§2.11", "A1", "O6"),
    ),
    "join_theta_range": QuerySpec(
        spark=join_theta_range,
        oracle="""
            SELECT p.p_brand, count(*) AS n_items,
                   round(avg(l.l_extendedprice), 4) AS avg_price
            FROM lineitem l
            JOIN part p
              ON l.l_partkey = p.p_partkey
             AND l.l_extendedprice >= p.p_retailprice * 2
             AND l.l_extendedprice < p.p_retailprice * 30
            GROUP BY 1
        """,
        doc="Equi + range-band theta join",
        tags=("§2.11",),
    ),
}
