"""Reference-shaped queries over the ``events`` fixture.

``events`` stands in for the reference's cleaned-transactions stream
(FIXTURES.md §A): ``user_id`` ~ Mint (grouping key), ``event_type`` ~
Type (SWAP filter), ``value`` ~ Token Amount, ``props`` ~ raw JSON
payload, ``ts`` ~ Timestamp (PST). Each query cites the SURVEY.md §2
operator IDs it covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.functions.banding import risk_band
from solana_etl_pipeline_spark.functions.jsonf import json_str
from solana_etl_pipeline_spark.functions.timestamps import format_ts, to_zone
from solana_etl_pipeline_spark.operators.risk import risk_scores, top_k_by_safety
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table

#: Stand-in for the reference's excluded wSOL/USDT/USDC mints
#: (``streamlit 1.3.txt:17-21``).
EXCLUDED_USER_IDS = [0, 1]


# ---------------------------------------------------------------------------
# Flagship: per-key risk scoring + top-k (A1-A7, F9-F12, P7, P8, O6)
# ---------------------------------------------------------------------------

def risk_scores_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``props.$.k`` plays the role of the counterparty account; the
    scored columns are dropped of the helper ``holder`` before top-k."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "holder", json_str(F.col("props"), "$.k")
    )
    scored = risk_scores(
        ev,
        key="user_id",
        holder_col="holder",
        buyer_col="holder",
        buy_type_col="event_type",
        buy_type_value="purchase",
        excluded_keys=EXCLUDED_USER_IDS,
    )
    return top_k_by_safety(scored, key="user_id", k=10)

_RISK_ORACLE = """
WITH agg AS (
  SELECT
    user_id,
    count(DISTINCT json_extract_string(props, '$.k')) AS unique_holders,
    count(DISTINCT CASE WHEN event_type = 'purchase'
                        THEN json_extract_string(props, '$.k') END) AS unique_buyers,
    count(*) AS total_events
  FROM events
  WHERE user_id NOT IN (0, 1)
  GROUP BY user_id
), scored AS (
  SELECT
    user_id, unique_holders, unique_buyers, total_events,
    CASE WHEN unique_holders > 0 THEN 100.0 / (1.0 + unique_holders)
         ELSE 100.0 END AS ownership_risk,
    CASE WHEN unique_buyers > 0 THEN 100.0 / (1.0 + unique_buyers)
         ELSE 100.0 END AS liquidity_risk,
    total_events / (1.0 + unique_holders) AS txn_concentration
  FROM agg
), weighted AS (
  SELECT *,
    0.4 * ownership_risk + 0.4 * liquidity_risk + 0.2 * txn_concentration
      AS jeet_risk_score
  FROM scored
)
SELECT
  user_id, unique_holders, unique_buyers, total_events,
  round(ownership_risk, 6) AS ownership_risk,
  round(liquidity_risk, 6) AS liquidity_risk,
  round(txn_concentration, 6) AS txn_concentration,
  round(jeet_risk_score, 6) AS jeet_risk_score,
  round(greatest(0.0, 100.0 - jeet_risk_score), 6) AS safety_score
FROM weighted
ORDER BY safety_score DESC, user_id
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Projections / predicates (P1, P7, P8, P9)
# ---------------------------------------------------------------------------

def risk_scores_topk_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship's ``approx_count_distinct`` (HLL++) escape hatch — at
    100 TB the exact per-key COUNT(DISTINCT) shuffles every (key,
    account) pair; HLL++ is map-side combinable, one pass.

    Driver-checkable via self-banding (like
    ``sketch_rollup_distinct_users``): ONE hash aggregate computes the
    exact and approximate counts side by side, the top-10 selection
    orders by the EXACT safety score (deterministic, SQL-expressible),
    and each row carries ``holders_est_ok``/``buyers_est_ok`` —
    approx within max(3, 15%) of exact: HLL++ default rsd is 5%, so
    15% is a 3-sigma envelope, with an absolute floor for tiny counts
    where one register collision is a big relative error. The oracle
    asserts the exact columns plus both flags TRUE — a broken
    estimator (off by orders of magnitude) fails the driver check,
    normal estimation noise cannot."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "holder", json_str(F.col("props"), "$.k")
    )
    scored = risk_scores(
        ev,
        key="user_id",
        holder_col="holder",
        buyer_col="holder",
        buy_type_col="event_type",
        buy_type_value="purchase",
        excluded_keys=EXCLUDED_USER_IDS,
    )
    approx = (
        ev.filter(~F.col("user_id").isin(EXCLUDED_USER_IDS))
        .groupBy("user_id")
        .agg(
            F.approx_count_distinct("holder").alias("approx_holders"),
            F.approx_count_distinct(
                F.when(F.col("event_type") == "purchase", F.col("holder"))
            ).alias("approx_buyers"),
        )
    )

    def _ok(approx_col: str, exact_col: str):
        return F.abs(F.col(approx_col) - F.col(exact_col)) <= F.greatest(
            F.lit(3.0), 0.15 * F.col(exact_col)
        )

    top = top_k_by_safety(scored.join(approx, "user_id"), key="user_id", k=10)
    return top.select(
        "user_id",
        "unique_holders",
        "unique_buyers",
        "total_events",
        "safety_score",
        _ok("approx_holders", "unique_holders").alias("holders_est_ok"),
        _ok("approx_buyers", "unique_buyers").alias("buyers_est_ok"),
    )


def events_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P8: narrow projection under an equality predicate.

    Both the filter and the 3-column projection reach the parquet scan
    (PushedFilters / ReadSchema) — the Spark analog of the reference
    transforming only 5 of N JSON fields (``cleandata1.py:25-34``).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )


def events_not_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7+P9: NOT-IN set predicate + non-null guard, then count per key."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(~F.col("user_id").isin(EXCLUDED_USER_IDS))
        .filter(F.col("props").isNotNull() & (F.col("props") != ""))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# JSON extraction (F13) + aggregation
# ---------------------------------------------------------------------------

def events_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: get_json_object over the raw payload, grouped stats."""
    ev = load_table(spark, sf_dir, "events")
    k = json_str(F.col("props"), "$.k").try_cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.count_distinct(F.col("k")).alias("distinct_k"),
        )
    )


# ---------------------------------------------------------------------------
# Conditional banding (F11, F12) + weighted math (F9, F10)
# ---------------------------------------------------------------------------

def events_value_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: 3-way when/otherwise banding, counts per band per type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("band", risk_band(F.col("value"), high=150.0, medium=75.0))
        .groupBy("event_type", "band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Timestamp zoo (F1, F2, F3)
# ---------------------------------------------------------------------------

def events_pst_rendering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: UTC instant -> America/Los_Angeles wall-clock string, the
    reference's ``convert_to_pst`` (``clean_data.py:27-34``), plus a
    per-PST-date rollup proving zone math matches the oracle."""
    ev = load_table(spark, sf_dir, "events")
    pst_day = F.date_format(to_zone(F.col("ts")), "yyyy-MM-dd")
    return (
        ev.withColumn("pst_day", pst_day)
        .groupBy("pst_day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window batch analog (§2.9 gap surface): per-hour counts.

    The streaming twin (``window(ts, '1 hour')`` + watermark) lives in
    ``streaming/ingest.py``; this is the batch-equivalent semantics the
    oracle can check.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("hour", format_ts(F.date_trunc("hour", F.col("ts"))))
        .groupBy("hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count_distinct(F.col("user_id")).alias("active_users"),
        )
    )


# ---------------------------------------------------------------------------
# Dedup (J2/T4 batch semantics) — exact duplicate drop by key
# ---------------------------------------------------------------------------

def events_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of the reference's intended exactly-once semantics
    (``my_websocket.py:101-105``): one row per (user_id, event_id),
    expressed as min-per-group so the survivor is deterministic for the
    oracle diff (Spark's ``dropDuplicates`` keeps an arbitrary row)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_id").agg(
        F.min("event_type").alias("event_type"),
        F.round(F.min("value"), 6).alias("value"),
    )


def risk_banding_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's per-token verdict table (``streamlit
    1.3.txt:115-151``): each risk metric banded HIGH/MEDIUM/LOW plus
    the overall 3-way verdict — implementing the *intended* semantics
    (the reference's >80 branch crashes on a missing dict key,
    SURVEY.md §0 bug 2)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "holder", json_str(F.col("props"), "$.k")
    )
    scored = risk_scores(
        ev,
        key="user_id",
        holder_col="holder",
        buyer_col="holder",
        buy_type_col="event_type",
        buy_type_value="purchase",
        excluded_keys=EXCLUDED_USER_IDS,
    )
    return scored.select(
        "user_id",
        risk_band(F.col("ownership_risk")).alias("ownership_band"),
        risk_band(F.col("liquidity_risk")).alias("liquidity_band"),
        risk_band(F.col("txn_concentration")).alias("concentration_band"),
        risk_band(F.col("jeet_risk_score")).alias("overall_band"),
        F.col("safety_score"),
    )


def token_detail_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's drill-down (``streamlit 1.3.txt:165-181``):
    select the safest key, render its display label, and list its
    newest 100 events — the full dashboard read path as one query."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "holder", json_str(F.col("props"), "$.k")
    )
    scored = risk_scores(
        ev,
        key="user_id",
        holder_col="holder",
        buyer_col="holder",
        buy_type_col="event_type",
        buy_type_value="purchase",
        excluded_keys=EXCLUDED_USER_IDS,
    )
    top1 = F.broadcast(
        top_k_by_safety(scored, key="user_id", k=1).select(
            "user_id", "safety_score"
        )
    )
    label = F.concat_ws(
        " | ", F.concat(F.lit("user_"), F.col("user_id")), F.col("user_id")
    )
    return (
        ev.join(top1, "user_id")
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(100)
        .select(
            label.alias("label"),
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            "safety_score",
        )
    )


QUERIES: dict[str, QuerySpec] = {
    "risk_scores_topk": QuerySpec(
        spark=risk_scores_topk,
        oracle=_RISK_ORACLE,
        doc="Flagship per-key risk scoring + top-k (streamlit 1.3.txt:83-113,165-167)",
        tags=("A1", "A2", "A3", "A4", "A7", "F9", "F10", "F12", "P7", "P8", "O6"),
    ),
    "risk_scores_topk_approx": QuerySpec(
        spark=risk_scores_topk_approx,
        oracle="""
            WITH agg AS (
              SELECT user_id,
                     count(DISTINCT json_extract_string(props, '$.k'))
                       AS unique_holders,
                     count(DISTINCT CASE WHEN event_type = 'purchase'
                       THEN json_extract_string(props, '$.k') END)
                       AS unique_buyers,
                     count(*) AS total_events
              FROM events WHERE user_id NOT IN (0, 1) GROUP BY user_id
            ), scored AS (
              SELECT *,
                CASE WHEN unique_holders > 0
                     THEN 100.0 / (1.0 + unique_holders) ELSE 100.0 END
                  AS ownership_risk,
                CASE WHEN unique_buyers > 0
                     THEN 100.0 / (1.0 + unique_buyers) ELSE 100.0 END
                  AS liquidity_risk,
                total_events / (1.0 + unique_holders) AS txn_concentration
              FROM agg
            ), weighted AS (
              SELECT *,
                0.4 * ownership_risk + 0.4 * liquidity_risk
                  + 0.2 * txn_concentration AS jeet
              FROM scored
            )
            SELECT user_id, unique_holders, unique_buyers, total_events,
                   round(greatest(0.0, 100.0 - jeet), 6) AS safety_score,
                   TRUE AS holders_est_ok,
                   TRUE AS buyers_est_ok
            FROM weighted
            ORDER BY safety_score DESC, user_id
            LIMIT 10
        """,
        doc="Flagship's HLL++ approx-distinct scale path, self-banded: "
        "exact columns drive the top-k, flags assert approx within "
        "max(2, 5%) of exact",
        tags=("A2", "A3", "X-scale"),
    ),
    "risk_banding_report": QuerySpec(
        spark=risk_banding_report,
        oracle="""
            WITH agg AS (
              SELECT user_id,
                     count(DISTINCT json_extract_string(props, '$.k'))
                       AS unique_holders,
                     count(DISTINCT CASE WHEN event_type = 'purchase'
                       THEN json_extract_string(props, '$.k') END)
                       AS unique_buyers,
                     count(*) AS total_events
              FROM events WHERE user_id NOT IN (0, 1) GROUP BY user_id
            ), scored AS (
              -- raw (unrounded) components, matching operators/risk.py,
              -- which rounds only at output; bands apply to the rounded
              -- columns exactly as the Spark side does
              SELECT user_id,
                CASE WHEN unique_holders > 0
                     THEN 100.0 / (1.0 + unique_holders)
                     ELSE 100.0 END AS ownership_risk,
                CASE WHEN unique_buyers > 0
                     THEN 100.0 / (1.0 + unique_buyers)
                     ELSE 100.0 END AS liquidity_risk,
                total_events / (1.0 + unique_holders) AS txn_concentration
              FROM agg
            ), weighted AS (
              SELECT *, 0.4 * ownership_risk + 0.4 * liquidity_risk
                        + 0.2 * txn_concentration AS jeet_risk_score
              FROM scored)
            SELECT user_id,
              CASE WHEN round(ownership_risk, 6) > 80 THEN 'HIGH'
                   WHEN round(ownership_risk, 6) > 50 THEN 'MEDIUM'
                   ELSE 'LOW' END AS ownership_band,
              CASE WHEN round(liquidity_risk, 6) > 80 THEN 'HIGH'
                   WHEN round(liquidity_risk, 6) > 50 THEN 'MEDIUM'
                   ELSE 'LOW' END AS liquidity_band,
              CASE WHEN round(txn_concentration, 6) > 80 THEN 'HIGH'
                   WHEN round(txn_concentration, 6) > 50 THEN 'MEDIUM'
                   ELSE 'LOW' END AS concentration_band,
              CASE WHEN round(jeet_risk_score, 6) > 80 THEN 'HIGH'
                   WHEN round(jeet_risk_score, 6) > 50 THEN 'MEDIUM'
                   ELSE 'LOW' END AS overall_band,
              round(greatest(0.0, 100.0 - jeet_risk_score), 6)
                AS safety_score
            FROM weighted
        """,
        doc="Per-key banded verdict table, intended semantics of the "
        "reference's crashing >80 branch (streamlit 1.3.txt:115-151)",
        tags=("F11", "F12", "A5"),
    ),
    "token_detail_view": QuerySpec(
        spark=token_detail_view,
        oracle="""
            WITH agg AS (
              SELECT user_id,
                     count(DISTINCT json_extract_string(props, '$.k'))
                       AS unique_holders,
                     count(DISTINCT CASE WHEN event_type = 'purchase'
                       THEN json_extract_string(props, '$.k') END)
                       AS unique_buyers,
                     count(*) AS total_events
              FROM events WHERE user_id NOT IN (0, 1) GROUP BY user_id
            ), weighted AS (
              SELECT user_id,
                0.4 * (CASE WHEN unique_holders > 0
                       THEN 100.0 / (1.0 + unique_holders)
                       ELSE 100.0 END)
                + 0.4 * (CASE WHEN unique_buyers > 0
                         THEN 100.0 / (1.0 + unique_buyers)
                         ELSE 100.0 END)
                + 0.2 * (total_events / (1.0 + unique_holders)) AS jeet
              FROM agg
            ), top1 AS (
              SELECT user_id,
                     round(greatest(0.0, 100.0 - jeet), 6) AS safety_score
              FROM weighted
              ORDER BY safety_score DESC, user_id LIMIT 1)
            SELECT 'user_' || e.user_id || ' | ' || e.user_id AS label,
                   e.event_id, e.event_type,
                   round(e.value, 6) AS value,
                   t.safety_score
            FROM events e JOIN top1 t ON e.user_id = t.user_id
            ORDER BY e.ts DESC, e.event_id
            LIMIT 100
        """,
        doc="Dashboard drill-down: top-safety key, label, newest-100 "
        "events (streamlit 1.3.txt:165-181)",
        tags=("F7", "O7", "P8", "O2"),
    ),
    "events_project_filter": QuerySpec(
        spark=events_project_filter,
        oracle="""
            SELECT event_id, user_id, value
            FROM events WHERE event_type = 'purchase'
        """,
        doc="Projection + equality predicate pushed to scan",
        tags=("P1", "P8"),
    ),
    "events_not_in_filter": QuerySpec(
        spark=events_not_in_filter,
        oracle="""
            SELECT user_id, count(*) AS n_events
            FROM events
            WHERE user_id NOT IN (0, 1)
              AND props IS NOT NULL AND props <> ''
            GROUP BY user_id
        """,
        doc="NOT-IN + non-null predicates",
        tags=("P7", "P9", "A4"),
    ),
    "events_json_extract_agg": QuerySpec(
        spark=events_json_extract_agg,
        oracle="""
            SELECT event_type,
                   count(*) AS n_events,
                   CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k,
                   count(DISTINCT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS distinct_k
            FROM events GROUP BY event_type
        """,
        doc="Ad-hoc JSON path extraction + cast-coerce",
        tags=("F13", "F4", "A2"),
    ),
    "events_value_banding": QuerySpec(
        spark=events_value_banding,
        oracle="""
            SELECT event_type,
                   CASE WHEN value > 150.0 THEN 'HIGH'
                        WHEN value > 75.0 THEN 'MEDIUM'
                        ELSE 'LOW' END AS band,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        doc="3-way when/otherwise banding (intended streamlit 1.3.txt:115-151)",
        tags=("F11", "F12"),
    ),
    "events_pst_rendering": QuerySpec(
        spark=events_pst_rendering,
        oracle="""
            SELECT strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/Los_Angeles',
                            '%Y-%m-%d') AS pst_day,
                   count(*) AS n_events,
                   round(avg(value), 6) AS avg_value
            FROM events GROUP BY 1
        """,
        doc="Epoch/UTC -> PST display conversion (clean_data.py:27-34)",
        tags=("F1", "F2"),
    ),
    "events_hourly_rollup": QuerySpec(
        spark=events_hourly_rollup,
        oracle="""
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value,
                   count(DISTINCT user_id) AS active_users
            FROM events GROUP BY 1
        """,
        doc="Tumbling-window batch analog (streaming twin in streaming/ingest.py)",
        tags=("T2", "A2", "A4"),
    ),
    "events_dedup_by_key": QuerySpec(
        spark=events_dedup_by_key,
        oracle="""
            SELECT user_id, event_id,
                   min(event_type) AS event_type,
                   round(min(value), 6) AS value
            FROM events GROUP BY user_id, event_id
        """,
        doc="Exactly-once dedup batch semantics (my_websocket.py:101-105 intended)",
        tags=("J2", "T4", "A7"),
    ),
}
