"""Time-series analytics: OHLC bars, bivariate statistics, and SCD2
state-interval history (SURVEY §2.11 extensions of the reference's
token-price dashboard, ``streamlit 1.3.txt:83-113``, which shows only
the latest per-token snapshot).

All three are exactly SQL-expressible, so all three carry full-value
oracles:

* ``events_ohlc_bars`` — the candlestick rollup every price dashboard
  needs: per (event_type, hour), open/high/low/close of ``value``.
  Open/close are argmin/argmax over the total order ``(ts, event_id)``
  (event_id is unique, so the order is total and both engines agree
  without min_by tie-break ambiguity).
* ``agg_corr_regression`` — corr / covariance / least-squares
  regression of extended price on quantity per returnflag: one
  map-side-combinable aggregation pass (all six moments are
  sum-of-products sketches).
* ``scd2_state_intervals`` — the gaps-and-islands SCD2 build over the
  per-user event-type "state" stream (operators/scd.py).

Scale posture: OHLC and the bivariate stats are plain hash
aggregations (map-side partials, no window); the SCD2 build is one
shuffle on user_id feeding window + agg (exchange reuse). Nothing
here collects or self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.functions.timestamps import format_ts
from solana_etl_pipeline_spark.operators.scd import state_intervals
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table


def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candlesticks of ``value`` per event type.

    ``min_by``/``max_by`` over ``struct(ts, event_id)`` pick the
    first/last event in the bar under a TOTAL order, so open/close are
    deterministic in both engines (the oracle uses row_number over the
    same order)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.withColumn("hour", format_ts(F.date_trunc("hour", F.col("ts"))))
        .groupBy("event_type", "hour")
        .agg(
            F.round(F.min_by("value", order_key), 6).alias("open_value"),
            F.round(F.max("value"), 6).alias("high_value"),
            F.round(F.min("value"), 6).alias("low_value"),
            F.round(F.max_by("value", order_key), 6).alias("close_value"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per returnflag: Pearson corr, sample/pop
    covariance, and the least-squares fit of extended price on
    quantity. Every statistic is a function of the six running sums
    (n, Σx, Σy, Σxx, Σyy, Σxy) — one mergeable aggregation pass, the
    same cost as a sum at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.corr(x, y), 6).alias("corr_qty_price"),
        F.round(F.covar_samp(x, y), 4).alias("covar_samp_qty_price"),
        F.round(F.covar_pop(x, y), 4).alias("covar_pop_qty_price"),
        F.round(F.regr_slope(y, x), 6).alias("regr_slope_price_on_qty"),
        F.round(F.regr_intercept(y, x), 4).alias("regr_intercept_price_on_qty"),
        F.round(F.regr_r2(y, x), 6).alias("regr_r2_price_on_qty"),
    )


def scd2_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity history of each user's event-type 'state': runs of
    consecutive equal event types collapse to one
    ``[valid_from, valid_to)`` interval; the open run is flagged
    current."""
    ev = load_table(spark, sf_dir, "events")
    return state_intervals(
        ev, key="user_id", state_col="event_type", ts_col="ts",
        tie_col="event_id",
    )


QUERIES: dict[str, QuerySpec] = {
    "events_ohlc_bars": QuerySpec(
        spark=events_ohlc_bars,
        oracle="""
            WITH v AS (
              SELECT event_type,
                     strftime(date_trunc('hour', ts),
                              '%Y-%m-%d %H:%M:%S') AS hour,
                     ts, event_id, value
              FROM events WHERE value IS NOT NULL),
            r AS (
              SELECT *,
                     row_number() OVER (PARTITION BY event_type, hour
                                        ORDER BY ts, event_id) AS rn_a,
                     row_number() OVER (PARTITION BY event_type, hour
                                        ORDER BY ts DESC, event_id DESC)
                       AS rn_d
              FROM v)
            SELECT event_type, hour,
                   round(max(CASE WHEN rn_a = 1 THEN value END), 6)
                     AS open_value,
                   round(max(value), 6) AS high_value,
                   round(min(value), 6) AS low_value,
                   round(max(CASE WHEN rn_d = 1 THEN value END), 6)
                     AS close_value,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM r GROUP BY event_type, hour
        """,
        doc="Hourly OHLC candlestick bars of value per event type",
        tags=("§2.11", "A"),
    ),
    "agg_corr_regression": QuerySpec(
        spark=agg_corr_regression,
        oracle="""
            SELECT l_returnflag,
                   count(*) AS n_rows,
                   round(corr(l_quantity, l_extendedprice), 6)
                     AS corr_qty_price,
                   round(covar_samp(l_quantity, l_extendedprice), 4)
                     AS covar_samp_qty_price,
                   round(covar_pop(l_quantity, l_extendedprice), 4)
                     AS covar_pop_qty_price,
                   round(regr_slope(l_extendedprice, l_quantity), 6)
                     AS regr_slope_price_on_qty,
                   round(regr_intercept(l_extendedprice, l_quantity), 4)
                     AS regr_intercept_price_on_qty,
                   round(regr_r2(l_extendedprice, l_quantity), 6)
                     AS regr_r2_price_on_qty
            FROM lineitem GROUP BY l_returnflag
        """,
        doc="corr/covar/regression of price on quantity per returnflag",
        tags=("§2.11", "A"),
    ),
    "scd2_state_intervals": QuerySpec(
        spark=scd2_state_intervals,
        oracle="""
            WITH ordered AS (
              SELECT user_id, event_type, ts, event_id,
                     CASE WHEN lag(event_type) OVER w IS NULL
                            OR event_type <> lag(event_type) OVER w
                          THEN 1 ELSE 0 END AS changed
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            runs AS (
              SELECT *,
                     sum(changed) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS run
              FROM ordered),
            intervals AS (
              SELECT user_id, run, event_type AS state,
                     min(ts) AS valid_from, count(*) AS n_events
              FROM runs GROUP BY user_id, run, event_type)
            SELECT user_id, state, valid_from,
                   lead(valid_from) OVER (PARTITION BY user_id
                                          ORDER BY run) AS valid_to,
                   n_events,
                   lead(valid_from) OVER (PARTITION BY user_id
                                          ORDER BY run) IS NULL
                     AS is_current
            FROM intervals
        """,
        doc="SCD2 gaps-and-islands validity intervals of user state",
        tags=("§2.11", "W"),
    ),
}
