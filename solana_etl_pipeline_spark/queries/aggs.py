"""Advanced aggregation surface (SURVEY.md §2.4 gap row + §2.11):
rollup / cube / grouping sets, exact percentiles, stddev/variance, and
deterministic collect_set — none of which exist in the reference.

All are single-pass hash aggregates (Expand + partial + final for the
grouping-set family): map-side combine keeps the shuffle proportional
to group count, not row count, at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.operators.sketches import (
    hll_daily_user_sketches,
    hll_range_estimate,
)
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table


def sketch_rollup_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style mergeable rollup: raw events → per-day HLL
    sketches → range-union distinct-user estimate (see
    ``operators/sketches.py``).

    The sketch estimate itself has no SQL oracle, so the query carries
    its own banding: it also computes the EXACT distinct count and
    emits ``est_within_5pct`` (HLL_4 at lgConfigK=12 has ~1.6%
    standard error, so 5% is a >3-sigma envelope). The oracle asserts
    that flag is true plus the exact values — making the sketch path
    driver-checkable instead of rows-only (r3 verdict item 8). The
    1-row × 1-row crossJoin is a deliberate scalar combine, not a data
    join. ``tests/test_sketches.py`` additionally pins rollup≡direct
    sketch equality."""
    ev = load_table(spark, sf_dir, "events")
    daily = hll_daily_user_sketches(ev)
    est = hll_range_estimate(daily)
    exact = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    return est.crossJoin(F.broadcast(exact)).select(
        "exact_users",
        "n_events",
        "n_days",
        (
            F.abs(F.col("distinct_users_est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("est_within_5pct"),
    )


APPROX_PCT_ACC = 10_000  # approx_percentile accuracy: rank error <= n/ACC


def sketch_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL/GK-family quantile sketch, self-banded like the HLL rollup:
    per event type, ``approx_percentile`` p50/p90 are checked against
    their RANK guarantee (the returned element's rank must lie within
    ``n/accuracy`` of the target rank — that is the sketch's actual
    contract; the VALUE can be arbitrarily far off in a gappy
    distribution). Exact p50/p90 are emitted alongside for the oracle;
    the rank flags are asserted TRUE by the oracle, making the sketch
    path driver-checkable instead of rows-only.

    Completes the mergeable-sketch family (HLL distinct, count-min
    frequency, fixed-bin histogram, approx_top_k heavy hitters): the
    quantile sketch is the bounded-state answer when value bounds are
    unknown up front (the fixed-bin histogram rollup needs lo/hi).

    Plan: one agg pass builds the sketches (mergeable, map-side
    partials), the ≤ |types| result broadcasts back into one
    conditional-count pass over the events — two scans total, nothing
    collected.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    approx = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.expr(
            f"approx_percentile(value, array(0.5, 0.9), {APPROX_PCT_ACC})"
        ).alias("ap"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("exact_p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("exact_p90"),
    )
    joined = ev.join(
        F.broadcast(
            approx.select(
                "event_type",
                "n_values",
                "exact_p50",
                "exact_p90",
                F.col("ap")[0].alias("ap50"),
                F.col("ap")[1].alias("ap90"),
            )
        ),
        "event_type",
    )

    def _rank_ok(ap_col: str, q: float):
        # rank slack: the sketch guarantees |rank - q*n| <= n/ACC;
        # +1 absorbs the discrete-rank boundary.
        slack = F.col("n_values") / APPROX_PCT_ACC + 1
        below = F.sum((F.col("value") < F.col(ap_col)).cast("long"))
        at_or_below = F.sum((F.col("value") <= F.col(ap_col)).cast("long"))
        target = q * F.col("n_values")
        return (below <= target + slack) & (at_or_below >= target - slack)

    return joined.groupBy(
        "event_type", "n_values", "exact_p50", "exact_p90"
    ).agg(
        _rank_ok("ap50", 0.5).alias("p50_rank_ok"),
        _rank_ok("ap90", 0.9).alias("p90_rank_ok"),
    )


def agg_rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (l_returnflag, l_linestatus): subtotals + grand
    total, TPC-H Q1 flavored."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
            .alias("sum_revenue"),
        )
    )


def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (o_orderstatus, o_orderpriority): all 4 grouping
    combinations in one pass."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
    )


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: per-type, per-user, and grand-total
    event counts (SQL surface; Spark's SQL API is first-class here)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT event_type, user_id,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (user_id), ())
        """
    )


def agg_percentiles_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/p90) + sample stddev/variance per
    event type. Exact ``percentile`` matches DuckDB's ``quantile_cont``
    interpolation; at 100 TB swap in ``percentile_approx`` (t-digest
    sketch, map-side combinable) — exact percentile needs a per-group
    sort."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_value"),
        F.round(F.stddev_samp("value"), 6).alias("stddev_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
    )


def agg_collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic collect_set: per-user sorted distinct event types
    as a joined string (collect_set order is nondeterministic, so sort
    before serializing — the only hash-stable form)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(F.collect_set("event_type")), ","
        ).alias("event_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sketch_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimates from MERGEABLE sketches: for every
    event-type pair, the distinct-user intersection via
    inclusion-exclusion on HLL sketches (|A∩B| = est(A) + est(B) −
    est(A∪B)) — the segment-overlap question a dashboard answers from
    KB-sized sketch rows without re-touching raw events.

    Self-banded like the HLL rollup: the exact overlap is computed
    alongside and the oracle asserts the estimate lands within 5% of
    the exact UNION size (inclusion-exclusion compounds the ~1.6%
    per-sketch error, and the union is the natural scale of that
    error). Raw events are touched twice (sketch agg, exact distinct
    pairs); the pair enumeration is a 5-row × 5-row sketch-table
    self-join — dimension-scale, a sanctioned bounded loop join."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    a = sk.select(
        F.col("event_type").alias("et_a"), F.col("sk").alias("sk_a")
    )
    b = sk.select(
        F.col("event_type").alias("et_b"), F.col("sk").alias("sk_b")
    )
    est = a.join(b, F.col("et_a") < F.col("et_b")).select(
        "et_a",
        "et_b",
        F.hll_sketch_estimate("sk_a").alias("est_a"),
        F.hll_sketch_estimate("sk_b").alias("est_b"),
        F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")).alias(
            "est_union"
        ),
    )
    # The distinct (type, user) frame feeds three branches (pair
    # join ×2, sizes); Catalyst dedups the repeated subplan via
    # ReusedExchange, so no persist is needed (measured: persisting
    # REGRESSED 0.7 s → 2.3 s at sf0.1 by blocking that reuse).
    du = ev.select("event_type", "user_id").distinct()
    x = du.select(
        F.col("event_type").alias("et_a"), F.col("user_id").alias("u")
    )
    y = du.select(
        F.col("event_type").alias("et_b"), F.col("user_id").alias("u")
    )
    exact_pair = (
        x.join(y, "u")
        .where(F.col("et_a") < F.col("et_b"))
        .groupBy("et_a", "et_b")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    exact_sz = du.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    joined = (
        est.join(exact_pair, ["et_a", "et_b"])
        .join(
            exact_sz.select(
                F.col("event_type").alias("et_a"), F.col("n").alias("n_a")
            ),
            "et_a",
        )
        .join(
            exact_sz.select(
                F.col("event_type").alias("et_b"), F.col("n").alias("n_b")
            ),
            "et_b",
        )
    )
    overlap_est = F.col("est_a") + F.col("est_b") - F.col("est_union")
    exact_union = F.col("n_a") + F.col("n_b") - F.col("exact_overlap")
    return joined.select(
        "et_a",
        "et_b",
        F.col("n_a").alias("exact_a"),
        F.col("n_b").alias("exact_b"),
        "exact_overlap",
        (
            F.abs(overlap_est - F.col("exact_overlap"))
            <= 0.05 * exact_union
        ).alias("overlap_est_ok"),
    )


_HLL_OVERLAP_ORACLE = """
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events),
    sz AS (SELECT event_type, count(*) AS n FROM du GROUP BY 1),
    pair AS (
      SELECT x.event_type AS et_a, y.event_type AS et_b,
             count(*) AS exact_overlap
      FROM du x JOIN du y ON x.user_id = y.user_id
      WHERE x.event_type < y.event_type
      GROUP BY 1, 2)
    SELECT p.et_a, p.et_b,
           sa.n AS exact_a, sb.n AS exact_b,
           p.exact_overlap,
           TRUE AS overlap_est_ok
    FROM pair p
    JOIN sz sa ON sa.event_type = p.et_a
    JOIN sz sb ON sb.event_type = p.et_b
"""


QUERIES: dict[str, QuerySpec] = {
    "sketch_hll_overlap": QuerySpec(
        spark=sketch_hll_overlap,
        oracle=_HLL_OVERLAP_ORACLE,
        doc="HLL inclusion-exclusion audience overlap, self-banded vs "
        "exact (flag must hold for the match)",
        tags=("§2.11", "A2"),
    ),
    "sketch_rollup_distinct_users": QuerySpec(
        spark=sketch_rollup_distinct_users,
        oracle="""
            SELECT count(DISTINCT user_id) AS exact_users,
                   count(*) AS n_events,
                   count(DISTINCT CAST(ts AS DATE)) AS n_days,
                   TRUE AS est_within_5pct
            FROM events
        """,
        doc="Mergeable per-day HLL sketch rollup → range distinct estimate, "
        "self-banded vs exact (est_within_5pct must hold for the match)",
        tags=("§2.11", "A2"),
    ),
    "sketch_quantile_approx": QuerySpec(
        spark=sketch_quantile_approx,
        oracle="""
            SELECT event_type,
                   count(*) AS n_values,
                   round(quantile_cont(value, 0.5), 6) AS exact_p50,
                   round(quantile_cont(value, 0.9), 6) AS exact_p90,
                   TRUE AS p50_rank_ok,
                   TRUE AS p90_rank_ok
            FROM events WHERE value IS NOT NULL
            GROUP BY event_type
        """,
        doc="approx_percentile quantile sketch, self-banded on its rank "
        "guarantee vs the exact quantiles (flags must hold to match)",
        tags=("§2.11", "A"),
    ),
    "agg_rollup_returnflag": QuerySpec(
        spark=agg_rollup_returnflag,
        oracle="""
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n_items,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 4)
                     AS sum_revenue
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        doc="ROLLUP subtotal hierarchy (TPC-H Q1 flavor)",
        tags=("§2.11", "A1"),
    ),
    "agg_cube_orders": QuerySpec(
        spark=agg_cube_orders,
        oracle="""
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 4) AS sum_price
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        doc="CUBE over two dimensions",
        tags=("§2.11",),
    ),
    "agg_grouping_sets": QuerySpec(
        spark=agg_grouping_sets,
        oracle="""
            SELECT event_type, user_id,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY GROUPING SETS ((event_type), (user_id), ())
        """,
        doc="Explicit GROUPING SETS",
        tags=("§2.11",),
    ),
    "agg_percentiles_stddev": QuerySpec(
        spark=agg_percentiles_stddev,
        oracle="""
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS median_value,
                   round(quantile_cont(value, 0.9), 6) AS p90_value,
                   round(stddev_samp(value), 6) AS stddev_value,
                   round(var_samp(value), 6) AS var_value
            FROM events GROUP BY event_type
        """,
        doc="Exact percentiles + stddev/variance",
        tags=("§2.11",),
    ),
    "agg_collect_set_sorted": QuerySpec(
        spark=agg_collect_set_sorted,
        oracle="""
            SELECT user_id,
                   array_to_string(list_sort(list(DISTINCT event_type)), ',')
                     AS event_types,
                   count(*) AS n_events
            FROM events GROUP BY user_id
        """,
        doc="Deterministic collect_set (sorted, serialized)",
        tags=("§2.11", "A7"),
    ),
}
