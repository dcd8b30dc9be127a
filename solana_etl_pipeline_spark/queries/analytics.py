"""Rollup-analytics queries: histogram-quantile hypertable rollup and
ordered conversion funnel (SURVEY §2.4/§2.11 extensions of the
reference's dashboard aggregations, ``streamlit 1.3.txt:96-104``,
which recompute per-type stats over raw rows on every refresh).

Both are exactly SQL-expressible — the histogram estimate is pure
BIGINT rank arithmetic plus two exact float ops, and the funnel is a
chain of dup-insensitive ``min(ts)`` aggregations — so both carry
full-value oracles (no tolerance bands needed, unlike the HLL
rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.operators.funnel import ordered_funnel
from solana_etl_pipeline_spark.operators.sketches import (
    cms_daily_rollup,
    cms_range_estimates,
    range_quantile_estimates,
    value_histogram_rollup,
)
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table

# Mid-month range so the rollup's day pruning is load-bearing.
HIST_START, HIST_END = "2024-01-08", "2024-01-22"
HIST_BINS, HIST_LO, HIST_HI = 64, 0.0, 512.0
_HIST_WIDTH = (HIST_HI - HIST_LO) / HIST_BINS
HIST_QS = (0.5, 0.9, 0.99)

FUNNEL_STEPS = ("signup", "click", "purchase")
FUNNEL_WITHIN = "7 days"


def agg_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day histogram rollup → p50/p90/p99 of ``value`` over a
    two-week range. The raw events are touched once (the rollup); the
    quantile math runs over ≤ 64 rollup rows."""
    ev = load_table(spark, sf_dir, "events")
    rollup = value_histogram_rollup(
        ev, n_bins=HIST_BINS, lo=HIST_LO, hi=HIST_HI
    )
    return range_quantile_estimates(
        rollup,
        qs=HIST_QS,
        start_day=HIST_START,
        end_day=HIST_END,
        n_bins=HIST_BINS,
        lo=HIST_LO,
        hi=HIST_HI,
    )


def funnel_conversion_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → click → purchase funnel, 7-day budget from signup."""
    ev = load_table(spark, sf_dir, "events")
    return ordered_funnel(
        ev, steps=FUNNEL_STEPS, within=FUNNEL_WITHIN
    )


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle: users grouped by first-active
    week; ``n_users`` = distinct users of that cohort active again
    ``week_offset`` weeks later. The product-analytics staple the
    reference's dashboard cannot express (it has no self-referential
    time grouping).

    Plan: the (user, week) activity grid dedups once, the cohort table
    derives from it with the same user_id shuffle key (exchange
    reuse through the join), and the final rollup is a plain hash agg.
    Both week truncations are Monday-based in Spark and DuckDB; the
    /7 division is exact because both operands are week-aligned.
    """
    ev = load_table(spark, sf_dir, "events")
    user_week = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort = user_week.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    return (
        user_week.join(cohort, "user_id")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


CMS_DEPTH, CMS_WIDTH = 4, 256
# Same mid-month range as the histogram rollup: the sketch is built
# over ALL days and the range is resolved against rollup rows, so the
# day pruning is load-bearing here too.
CMS_START, CMS_END = HIST_START, HIST_END


def sketch_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min per-user event frequencies over a two-week range,
    pinned cell-by-cell against exact counts: the daily CMS rollup is
    merged across the range, every in-range user's estimate is the
    min over its ``depth`` probed cells, and the emitted
    ``overestimate = est - exact`` is the sketch's collision error —
    ≥ 0 by construction, exactly reproducible by the oracle because
    the md5 cell hash is bit-identical in both engines."""
    ev = load_table(spark, sf_dir, "events")
    rollup = cms_daily_rollup(
        ev, "user_id", depth=CMS_DEPTH, width=CMS_WIDTH
    )
    in_range = ev.filter(
        F.col("user_id").isNotNull()
        & (F.to_date("ts") >= F.lit(CMS_START).cast("date"))
        & (F.to_date("ts") < F.lit(CMS_END).cast("date"))
    )
    exact = in_range.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    est = cms_range_estimates(
        rollup,
        exact.select("user_id"),
        item_col="user_id",
        depth=CMS_DEPTH,
        width=CMS_WIDTH,
        start_day=CMS_START,
        end_day=CMS_END,
    )
    return (
        exact.join(
            est, F.col("item") == F.col("user_id").cast("string")
        )
        .select(
            "user_id",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias(
                "overestimate"
            ),
        )
    )


def _q_rank_sql(q: float) -> str:
    q_micro = int(round(q * 1_000_000))
    return f"greatest(1, ({q_micro} * total + 999999) // 1000000)"


# e0-suffixed literals: DuckDB parses bare 0.5/8.0 as DECIMAL and the
# whole est expression would come back decimal-typed (the driver
# hashes Arrow types); scientific notation forces DOUBLE, matching
# Spark's literal typing.
_HIST_Q_SELECTS = "\n            UNION ALL\n".join(
    f"""            SELECT {int(round(q * 1_000_000))} / 1000000.0e0 AS q,
                   CAST({_q_rank_sql(q)} AS BIGINT) AS rank,
                   CAST(total AS BIGINT) AS total,
                   round({HIST_LO}e0 + (min(bin) + 0.5e0) * {_HIST_WIDTH}e0,
                         6) AS est
            FROM cum WHERE cum >= {_q_rank_sql(q)}
            GROUP BY total"""
    for q in HIST_QS
)

QUERIES: dict[str, QuerySpec] = {
    "agg_histogram_quantiles": QuerySpec(
        spark=agg_histogram_quantiles,
        oracle=f"""
            WITH binned AS (
              SELECT CAST(ts AS DATE) AS day,
                     least({HIST_BINS - 1}, greatest(0,
                       CAST(floor((value - {HIST_LO}) / {_HIST_WIDTH})
                            AS INT))) AS bin,
                     count(*) AS n
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
            scoped AS (
              SELECT bin, sum(n) AS n FROM binned
              WHERE day >= DATE '{HIST_START}' AND day < DATE '{HIST_END}'
              GROUP BY 1),
            cum AS (
              SELECT bin, n,
                     sum(n) OVER (ORDER BY bin) AS cum,
                     (SELECT sum(n) FROM scoped) AS total
              FROM scoped)
{_HIST_Q_SELECTS}
        """,
        doc="Mergeable per-day histogram rollup → range p50/p90/p99",
        tags=("§2.11", "A"),
    ),
    "funnel_conversion_steps": QuerySpec(
        spark=funnel_conversion_steps,
        oracle=f"""
            WITH s1 AS (
              SELECT user_id AS u, min(ts) AS t1 FROM events
              WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1),
            s2 AS (
              SELECT e.user_id AS u, min(s1.t1) AS t1, min(e.ts) AS t2
              FROM events e JOIN s1 ON s1.u = e.user_id
              WHERE e.event_type = '{FUNNEL_STEPS[1]}'
                AND e.ts > s1.t1
                AND e.ts <= s1.t1 + INTERVAL 7 DAY
              GROUP BY 1),
            s3 AS (
              SELECT e.user_id AS u, min(s2.t1) AS t1, min(e.ts) AS t3
              FROM events e JOIN s2 ON s2.u = e.user_id
              WHERE e.event_type = '{FUNNEL_STEPS[2]}'
                AND e.ts > s2.t2
                AND e.ts <= s2.t1 + INTERVAL 7 DAY
              GROUP BY 1),
            counts AS (
              SELECT 1 AS step_idx, '{FUNNEL_STEPS[0]}' AS step,
                     (SELECT count(*) FROM s1) AS n_users
              UNION ALL
              SELECT 2, '{FUNNEL_STEPS[1]}', (SELECT count(*) FROM s2)
              UNION ALL
              SELECT 3, '{FUNNEL_STEPS[2]}', (SELECT count(*) FROM s3))
            SELECT step_idx, step, n_users,
                   round(n_users * 1.0 /
                         (SELECT n_users FROM counts WHERE step_idx = 1),
                         6) AS conversion
            FROM counts
        """,
        doc="Ordered signup→click→purchase funnel, 7-day entry budget",
        tags=("§2.11", "A"),
    ),
    "sketch_cms_user_counts": QuerySpec(
        spark=sketch_cms_user_counts,
        oracle=f"""
            WITH ev AS (
              SELECT user_id, CAST(user_id AS VARCHAR) AS item,
                     CAST(ts AS DATE) AS day
              FROM events WHERE user_id IS NOT NULL),
            rws AS (SELECT unnest(range({CMS_DEPTH})) AS row_idx),
            cells AS (
              SELECT day, row_idx,
                     ('0x' || substr(md5(CAST(row_idx AS VARCHAR)
                       || ':' || item), 1, 8))::BIGINT % {CMS_WIDTH}
                       AS bucket,
                     count(*) AS cnt
              FROM ev CROSS JOIN rws GROUP BY 1, 2, 3),
            merged AS (
              SELECT row_idx, bucket, sum(cnt) AS cnt FROM cells
              WHERE day >= DATE '{CMS_START}' AND day < DATE '{CMS_END}'
              GROUP BY 1, 2),
            exact AS (
              SELECT user_id, item, count(*) AS exact_count FROM ev
              WHERE day >= DATE '{CMS_START}' AND day < DATE '{CMS_END}'
              GROUP BY 1, 2),
            probes AS (
              SELECT e.user_id, e.exact_count, r.row_idx,
                     ('0x' || substr(md5(CAST(r.row_idx AS VARCHAR)
                       || ':' || e.item), 1, 8))::BIGINT % {CMS_WIDTH}
                       AS bucket
              FROM exact e CROSS JOIN rws r),
            est AS (
              SELECT user_id, exact_count,
                     min(coalesce(m.cnt, 0)) AS cms_estimate
              FROM probes p
              LEFT JOIN merged m USING (row_idx, bucket)
              GROUP BY 1, 2)
            SELECT user_id,
                   CAST(exact_count AS BIGINT) AS exact_count,
                   CAST(cms_estimate AS BIGINT) AS cms_estimate,
                   CAST(cms_estimate - exact_count AS BIGINT)
                     AS overestimate
            FROM est
        """,
        doc="Mergeable daily count-min rollup → range per-user counts",
        tags=("§2.11", "A"),
    ),
    "events_cohort_retention": QuerySpec(
        spark=events_cohort_retention,
        oracle="""
            WITH uw AS (
              SELECT DISTINCT user_id, date_trunc('week', ts) AS week
              FROM events),
            coh AS (
              SELECT user_id, min(week) AS cohort_week
              FROM uw GROUP BY 1)
            SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
                   CAST(datediff('day', c.cohort_week, u.week) // 7
                        AS BIGINT) AS week_offset,
                   count(DISTINCT u.user_id) AS n_users
            FROM uw u JOIN coh c USING (user_id)
            GROUP BY 1, 2
        """,
        doc="Weekly cohort-retention triangle (first-active-week cohorts)",
        tags=("§2.11", "A"),
    ),
}
