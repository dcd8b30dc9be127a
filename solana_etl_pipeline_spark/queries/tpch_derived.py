"""TPC-H shapes that need ``partsupp`` — run over a DERIVED partsupp
(SURVEY.md §2.11; completes the classic suite).

The fixtures ship no ``partsupp``, but its two analytic columns can be
derived deterministically: the pair set is ``SELECT DISTINCT
(l_partkey, l_suppkey)`` and cost/availqty are arithmetic on the keys —
identical in Spark and DuckDB, so every query here is oracle-paired.

New physical-plan shapes this file pins (nothing else in the suite
covers them):

- Q2: correlated min-subquery per group → window-min over the
  pre-joined regional slice, never a per-row re-scan.
- Q9: multi-fact profit join on the composite (partkey, suppkey) key.
- Q11: HAVING against a scalar subquery (group value vs global total).
- Q16: ``NOT IN`` (Spark plans the null-aware anti join) + multi-column
  count-distinct groups.
- Q20: ``IN`` over a correlated aggregate threshold — the nested
  decorrelation stress test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table

#: SQL twin of :func:`derived_partsupp` — prefix any oracle with it.
PARTSUPP_CTE = """
    WITH partsupp AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             ((l_partkey * 31 + l_suppkey * 7) % 10000) / 100.0 + 1.0
               AS ps_supplycost,
             (l_partkey * 13 + l_suppkey * 17) % 9999 + 1 AS ps_availqty
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp: distinct (part, supplier) pairs from
    lineitem with key-arithmetic cost/availqty (same formula as
    ``PARTSUPP_CTE``, double-precision identical across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .withColumn(
            "ps_supplycost",
            ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 7) % 10000)
            / 100.0
            + 1.0,
        )
        .withColumn(
            "ps_availqty",
            (F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 17) % 9999 + 1,
        )
    )


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: cheapest EUROPE supplier(s) per size-15 part. The correlated
    min decorrelates to a window min over the regional slice (computed
    once), not a per-part re-aggregation."""
    ps = derived_partsupp(spark, sf_dir)
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    regional = (
        ps.join(F.broadcast(supplier), ps.ps_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
    )
    w = Window.partitionBy("ps_partkey")
    return (
        regional.join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round("ps_supplycost", 2).alias("supplycost"),
        )
    )


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: nation/year profit for red parts — revenue minus derived
    supply cost, joined on the composite (partkey, suppkey) key.

    The partsupp side is derived from the RED-filtered fact rather
    than all of lineitem: cost is key arithmetic, so ps rows for
    non-red parts can never survive the join — semantically identical
    (same oracle), but the distinct-pair shuffle and the composite-key
    join shrink by the part-filter selectivity (~25×). The general
    lesson: when a derived dimension is only consumed through a
    filtered fact, derive it from the filtered fact."""
    li_all = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    li = li_all.join(F.broadcast(part), li_all.l_partkey == part.p_partkey)
    ps = (
        li.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .withColumn(
            "ps_supplycost",
            ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 7) % 10000)
            / 100.0
            + 1.0,
        )
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        li.join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.round(F.sum(profit), 4).alias("profit"))
    )


def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts whose NATION_5 stock value exceeds 0.1% of the
    nation's total — HAVING vs a scalar subquery, expressed through the
    SQL API so Catalyst plans the scalar-subquery reuse."""
    derived_partsupp(spark, sf_dir).createOrReplaceTempView("ps_q11")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("s_q11")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("n_q11")
    return spark.sql(
        """
        SELECT ps_partkey,
               round(sum(ps_supplycost * ps_availqty), 4) AS stock_value
        FROM ps_q11
        JOIN s_q11 ON ps_suppkey = s_suppkey
        JOIN n_q11 ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY ps_partkey
        HAVING sum(ps_supplycost * ps_availqty) >
               (SELECT 0.001 * sum(ps_supplycost * ps_availqty)
                FROM ps_q11
                JOIN s_q11 ON ps_suppkey = s_suppkey
                JOIN n_q11 ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_5')
        """
    )


def tpch_q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: supplier counts per part attribute triple, excluding a
    supplier blocklist via NOT IN — Spark must plan the null-aware
    anti join."""
    derived_partsupp(spark, sf_dir).createOrReplaceTempView("ps_q16")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("p_q16")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("s_q16")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT ps_suppkey) AS supplier_cnt
        FROM ps_q16
        JOIN p_q16 ON p_partkey = ps_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
          AND ps_suppkey NOT IN (SELECT s_suppkey FROM s_q16
                                 WHERE s_name LIKE '%000000001%')
        GROUP BY p_brand, p_type, p_size
        """
    )


def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: suppliers overstocked (availqty > half of 1996 demand) on
    small parts — IN over a correlated aggregate threshold; Catalyst
    decorrelates the inner sum into an aggregate-then-join."""
    derived_partsupp(spark, sf_dir).createOrReplaceTempView("ps_q20")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("p_q20")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("s_q20")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("l_q20")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
        FROM s_q20
        WHERE s_suppkey IN (
            SELECT ps_suppkey FROM ps_q20
            WHERE ps_partkey IN (SELECT p_partkey FROM p_q20
                                 WHERE p_name LIKE 'small%')
              AND ps_availqty > (SELECT 0.5 * sum(l_quantity)
                                 FROM l_q20
                                 WHERE l_partkey = ps_partkey
                                   AND l_suppkey = ps_suppkey
                                   AND l_shipdate >= TIMESTAMP '1996-01-01'
                                   AND l_shipdate < TIMESTAMP '1997-01-01'))
        """
    )


QUERIES: dict[str, QuerySpec] = {
    "tpch_q2_min_cost_supplier": QuerySpec(
        spark=tpch_q2_min_cost_supplier,
        oracle=PARTSUPP_CTE
        + """
            SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
                   round(ps.ps_supplycost, 2) AS supplycost
            FROM part p, partsupp ps, supplier s, nation n, region r
            WHERE p.p_partkey = ps.ps_partkey
              AND s.s_suppkey = ps.ps_suppkey
              AND p.p_size = 15
              AND s.s_nationkey = n.n_nationkey
              AND n.n_regionkey = r.r_regionkey
              AND r.r_name = 'EUROPE'
              AND ps.ps_supplycost = (
                  SELECT min(ps2.ps_supplycost)
                  FROM partsupp ps2, supplier s2, nation n2, region r2
                  WHERE ps2.ps_partkey = p.p_partkey
                    AND s2.s_suppkey = ps2.ps_suppkey
                    AND s2.s_nationkey = n2.n_nationkey
                    AND n2.n_regionkey = r2.r_regionkey
                    AND r2.r_name = 'EUROPE')
        """,
        doc="TPC-H Q2 cheapest regional supplier per part (window min)",
        tags=("§2.11", "A8"),
    ),
    "tpch_q9_product_profit": QuerySpec(
        spark=tpch_q9_product_profit,
        oracle=PARTSUPP_CTE
        + """
            SELECT n.n_name AS nation,
                   CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)
                             - ps.ps_supplycost * l.l_quantity), 4) AS profit
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN partsupp ps ON l.l_partkey = ps.ps_partkey
                            AND l.l_suppkey = ps.ps_suppkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE p.p_name LIKE '%red%'
            GROUP BY 1, 2
        """,
        doc="TPC-H Q9 nation/year profit (composite-key fact join)",
        tags=("§2.11", "J1"),
    ),
    "tpch_q11_important_stock": QuerySpec(
        spark=tpch_q11_important_stock,
        oracle=PARTSUPP_CTE
        + """
            SELECT ps_partkey,
                   round(sum(ps_supplycost * ps_availqty), 4) AS stock_value
            FROM partsupp
            JOIN supplier ON ps_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_5'
            GROUP BY ps_partkey
            HAVING sum(ps_supplycost * ps_availqty) >
                   (SELECT 0.001 * sum(ps_supplycost * ps_availqty)
                    FROM partsupp
                    JOIN supplier ON ps_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
                    WHERE n_name = 'NATION_5')
        """,
        doc="TPC-H Q11 HAVING vs scalar subquery (important stock)",
        tags=("§2.11", "A9"),
    ),
    "tpch_q16_parts_supplier_cnt": QuerySpec(
        spark=tpch_q16_parts_supplier_cnt,
        oracle=PARTSUPP_CTE
        + """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT ps_suppkey) AS supplier_cnt
            FROM partsupp
            JOIN part ON p_partkey = ps_partkey
            WHERE p_brand <> 'Brand#1'
              AND p_type <> 'PROMO'
              AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
              AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                     WHERE s_name LIKE '%000000001%')
            GROUP BY p_brand, p_type, p_size
        """,
        doc="TPC-H Q16 NOT IN (null-aware anti join) + distinct counts",
        tags=("§2.11", "P7"),
    ),
    "tpch_q20_promotion_suppliers": QuerySpec(
        spark=tpch_q20_promotion_suppliers,
        oracle=PARTSUPP_CTE
        + """
            SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
            FROM supplier
            WHERE s_suppkey IN (
                SELECT ps_suppkey FROM partsupp
                WHERE ps_partkey IN (SELECT p_partkey FROM part
                                     WHERE p_name LIKE 'small%')
                  AND ps_availqty > (SELECT 0.5 * sum(l_quantity)
                                     FROM lineitem
                                     WHERE l_partkey = ps_partkey
                                       AND l_suppkey = ps_suppkey
                                       AND l_shipdate >= TIMESTAMP '1996-01-01'
                                       AND l_shipdate < TIMESTAMP '1997-01-01'))
        """,
        doc="TPC-H Q20 IN over correlated aggregate threshold",
        tags=("§2.11", "J2"),
    ),
}
