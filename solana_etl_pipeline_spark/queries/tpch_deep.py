"""Deep TPC-H coverage — the remaining classic plan shapes expressible
over the fixture star schema (SURVEY.md §2.11 general-relational).

The fixtures carry no ``partsupp`` and a trimmed ``lineitem`` (no
commitdate/receiptdate/shipmode), so Q2/Q9/Q11/Q16/Q20 are out of
scope; Q4 and Q21 are adapted to ``l_returnflag`` as the "late" marker.
Each query here exists to pin a distinct physical-plan shape that
matters at 100 TB:

- Q3/Q10/Q18: join → agg → TakeOrderedAndProject top-k (never a
  global sort; the driver merges k rows per partition).
- Q4: correlated EXISTS → left-semi join (one shuffle, no fanout).
- Q7/Q8: multi-join with broadcast dims on both legs of the fact.
- Q15: argmax-over-aggregate via a single-row window max — the
  aggregate (one row per supplier) is tiny, so the empty-frame window
  is a cheap single-partition pass over post-agg data, not over facts.
- Q17: correlated scalar AVG decorrelated into a pre-aggregation +
  shuffle join on ``l_partkey`` — the scalable rewrite of the
  per-row subquery.
- Q19: OR-of-conjunctions predicate evaluated post broadcast-join;
  the shared ``l_quantity`` bounds are pushed to the parquet scan.
- Q21: EXISTS + NOT EXISTS over self-aliased lineitem → one
  left-semi plus one left-anti join, via the SQL API so Catalyst
  plans the decorrelation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: unshipped-order revenue for one market segment, top-10
    orders by revenue (ref has no analog; general join+topk shape)."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (adapted): order-priority counts for orders with at least one
    returned line — correlated EXISTS planned as a left-semi join.
    (Fixture lacks commitdate/receiptdate; ``l_returnflag = 'R'``
    stands in for the late-delivery predicate.)"""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume between two nations by ship year.
    The two nation dims broadcast; the symmetric pair predicate is
    applied after both legs resolve."""
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
    )


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of ECONOMY-part revenue sold into ASIA,
    per order year — conditional numerator over a 7-table join."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _rev()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by lost (returned) revenue in a quarter."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue — argmax over
    an aggregate. The window max runs over the ~|suppliers| aggregate
    rows (single tiny partition), not over lineitem."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(_rev()), 4).alias("total_revenue"))
    )
    top = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    return (
        top.join(F.broadcast(supplier), top.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from small-quantity orders of one brand — the
    correlated ``0.2 * avg(l_quantity)`` subquery decorrelated into a
    per-part pre-aggregation joined back on ``l_partkey``."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    )
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(thresh), li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: top-20 largest-volume orders (HAVING-subquery semi-join)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
        .select(F.col("l_orderkey").alias("big_okey"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(big), li.l_orderkey == F.col("big_okey"), "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


def tpch_q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: OR-of-conjunctions across both join sides. The shared
    ``l_quantity`` envelope (1..30) is pushed to the lineitem scan;
    the brand/size/quantity triplets evaluate after the broadcast
    join resolves part attributes."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    part = load_table(spark, sf_dir, "part")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(clause)
        .agg(
            F.round(F.sum(_rev()), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 (adapted): suppliers who were the *sole* returning supplier
    on a finalized multi-supplier order — EXISTS (another supplier on
    the order) + NOT EXISTS (another supplier who also returned).
    Expressed through the SQL API so Catalyst decorrelates into a
    left-semi and a left-anti join on ``l_orderkey``; top-10 with a
    name tie-break. (``l_returnflag = 'R'`` stands in for the
    receipt-after-commit lateness predicate the fixture lacks.)"""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("s_q21")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("l_q21")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("o_q21")
    return spark.sql(
        """
        SELECT s.s_name, count(*) AS numwait
        FROM s_q21 s
        JOIN l_q21 l1 ON s.s_suppkey = l1.l_suppkey
        JOIN o_q21 o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM l_q21 l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM l_q21 l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 10
        """
    )


QUERIES: dict[str, QuerySpec] = {
    "tpch_q3_shipping_priority": QuerySpec(
        spark=tpch_q3_shipping_priority,
        oracle="""
            SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                     AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-15'
              AND l.l_shipdate > TIMESTAMP '1998-06-15'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, l.l_orderkey
            LIMIT 10
        """,
        doc="TPC-H Q3 segment revenue top-10 (join → agg → top-k)",
        tags=("§2.11", "O6"),
    ),
    "tpch_q4_order_priority": QuerySpec(
        spark=tpch_q4_order_priority,
        oracle="""
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
              AND o.o_orderdate < TIMESTAMP '1996-10-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')
            GROUP BY 1
        """,
        doc="TPC-H Q4 (adapted) EXISTS → left-semi join",
        tags=("§2.11", "J2"),
    ),
    "tpch_q7_volume_shipping": QuerySpec(
        spark=tpch_q7_volume_shipping,
        oracle="""
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(extract(year FROM l.l_shipdate) AS BIGINT) AS l_year,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                     AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
        """,
        doc="TPC-H Q7 bilateral trade volume by year",
        tags=("§2.11", "J1"),
    ),
    "tpch_q8_market_share": QuerySpec(
        spark=tpch_q8_market_share,
        oracle="""
            SELECT CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   round(sum(CASE WHEN n2.n_name = 'NATION_3'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0.0 END)
                         / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
                     AS mkt_share,
                   count(*) AS n_items
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
            JOIN region r ON n1.n_regionkey = r.r_regionkey
            JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
            WHERE p.p_type = 'ECONOMY'
              AND r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1
        """,
        doc="TPC-H Q8 national market share per year",
        tags=("§2.11", "F12"),
    ),
    "tpch_q10_returned_items": QuerySpec(
        spark=tpch_q10_returned_items,
        oracle="""
            SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                     AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
              AND l.l_returnflag = 'R'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c.c_custkey
            LIMIT 20
        """,
        doc="TPC-H Q10 returned-revenue top-20 customers",
        tags=("§2.11", "O6"),
    ),
    "tpch_q15_top_supplier": QuerySpec(
        spark=tpch_q15_top_supplier,
        oracle="""
            WITH revenue AS (
                SELECT l_suppkey,
                       round(sum(l_extendedprice * (1 - l_discount)), 4)
                         AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY 1)
            SELECT s.s_suppkey, s.s_name, r.total_revenue
            FROM supplier s
            JOIN revenue r ON s.s_suppkey = r.l_suppkey
            WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        """,
        doc="TPC-H Q15 argmax supplier by quarterly revenue",
        tags=("§2.11", "A8"),
    ),
    "tpch_q17_small_qty_revenue": QuerySpec(
        spark=tpch_q17_small_qty_revenue,
        oracle="""
            SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly,
                   count(*) AS n_items
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand = 'Brand#3'
              AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                                  FROM lineitem l2
                                  WHERE l2.l_partkey = l.l_partkey)
        """,
        doc="TPC-H Q17 correlated-avg decorrelated to pre-agg join",
        tags=("§2.11", "A5"),
    ),
    "tpch_q18_large_orders": QuerySpec(
        spark=tpch_q18_large_orders,
        oracle="""
            SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
                   o.o_totalprice,
                   round(sum(l.l_quantity), 2) AS total_qty
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE l.l_orderkey IN (SELECT l_orderkey FROM lineitem
                                   GROUP BY 1
                                   HAVING sum(l_quantity) > 250)
            GROUP BY 1, 2, 3, 4, 5
            ORDER BY o.o_totalprice DESC, o.o_orderkey
            LIMIT 20
        """,
        doc="TPC-H Q18 large-volume orders (HAVING semi-join)",
        tags=("§2.11", "A9"),
    ),
    "tpch_q19_disjunctive_filter": QuerySpec(
        spark=tpch_q19_disjunctive_filter,
        oracle="""
            SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                     AS revenue,
                   count(*) AS n_items
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 1 AND 11)
               OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
                   AND l.l_quantity BETWEEN 10 AND 20)
               OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 35
                   AND l.l_quantity BETWEEN 20 AND 30)
        """,
        doc="TPC-H Q19 OR-of-conjunctions predicate",
        tags=("§2.11", "P8"),
    ),
    "tpch_q21_waiting_supplier": QuerySpec(
        spark=tpch_q21_waiting_supplier,
        oracle="""
            SELECT s.s_name, count(*) AS numwait
            FROM supplier s
            JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
            JOIN orders o ON o.o_orderkey = l1.l_orderkey
            WHERE o.o_orderstatus = 'F'
              AND l1.l_returnflag = 'R'
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R')
            GROUP BY 1
            ORDER BY numwait DESC, s.s_name
            LIMIT 10
        """,
        doc="TPC-H Q21 (adapted) sole-returner suppliers (semi + anti)",
        tags=("§2.11", "J2"),
    ),
}
