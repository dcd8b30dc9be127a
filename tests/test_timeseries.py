"""Unit tests for the time-series surface: SCD2 interval builder,
OHLC bars, and the bivariate regression aggregate (hand-computed
fixtures; the oracle-parity gate covers the fixture tables)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from solana_etl_pipeline_spark.operators.scd import state_intervals
from solana_etl_pipeline_spark.queries.timeseries import (
    agg_corr_regression,
    events_ohlc_bars,
    scd2_state_intervals,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def state_df(spark):
    rows = [
        # user 1: A A B A  -> three intervals (run lengths 2,1,1)
        (1, _ts("2024-01-01T00:00:00"), 10, "A"),
        (1, _ts("2024-01-01T01:00:00"), 11, "A"),
        (1, _ts("2024-01-01T02:00:00"), 12, "B"),
        (1, _ts("2024-01-01T03:00:00"), 13, "A"),
        # user 2: single event -> one open interval
        (2, _ts("2024-01-02T00:00:00"), 20, "C"),
        # user 3: same-ts tie broken by event_id (B@5 then A@6)
        (3, _ts("2024-01-03T00:00:00"), 5, "B"),
        (3, _ts("2024-01-03T00:00:00"), 6, "A"),
    ]
    return spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"]
    )


def test_scd2_runs_collapse_and_open_interval(state_df):
    out = state_intervals(
        state_df, key="user_id", state_col="event_type",
        ts_col="ts", tie_col="event_id",
    )
    rows = {
        (r.user_id, r.valid_from, r.state): r
        for r in out.collect()
    }
    assert len(rows) == 6

    u1_first = rows[(1, _ts("2024-01-01T00:00:00"), "A")]
    assert u1_first.n_events == 2
    assert u1_first.valid_to == _ts("2024-01-01T02:00:00")
    assert not u1_first.is_current

    u1_last = rows[(1, _ts("2024-01-01T03:00:00"), "A")]
    assert (u1_last.valid_to, u1_last.is_current) == (None, True)

    u2 = rows[(2, _ts("2024-01-02T00:00:00"), "C")]
    assert (u2.state, u2.n_events, u2.is_current) == ("C", 1, True)


def test_scd2_same_ts_tie_breaks_on_event_id(state_df):
    out = state_intervals(
        state_df, key="user_id", state_col="event_type",
        ts_col="ts", tie_col="event_id",
    )
    u3 = {r.state: r for r in out.collect() if r.user_id == 3}
    # event_id 5 (B) sorts before event_id 6 (A): B's run opens first
    # and closes AT the same timestamp (zero-length interval); A's run
    # is the open current one. The lead window orders by the run
    # counter, so this is deterministic despite the equal valid_from.
    assert set(u3) == {"A", "B"}
    assert u3["B"].valid_to == u3["B"].valid_from
    assert not u3["B"].is_current
    assert u3["A"].valid_to is None and u3["A"].is_current


def test_scd2_single_shuffle_plan(spark, sf_dir):
    """Scale pin: the whole SCD2 build runs off ONE hash exchange on
    user_id (both windows + the run aggregation reuse it)."""
    plan = (
        scd2_state_intervals(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_ohlc_open_close_follow_event_order(spark):
    rows = [
        # same hour, shuffled insert order; (ts, event_id) total order
        ("x", _ts("2024-01-01T10:20:00"), 2, 5.0),
        ("x", _ts("2024-01-01T10:05:00"), 1, 3.0),
        ("x", _ts("2024-01-01T10:50:00"), 3, 1.0),
        # same-ts tie: event_id 5 is the close, not 4
        ("y", _ts("2024-01-01T10:00:00"), 4, 7.0),
        ("y", _ts("2024-01-01T10:00:00"), 5, 9.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_type", "ts", "event_id", "value"]
    )
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    out = {
        r.event_type: r
        for r in df.groupBy("event_type")
        .agg(
            F.min_by("value", order_key).alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max_by("value", order_key).alias("close_value"),
        )
        .collect()
    }
    x = out["x"]
    assert (x.open_value, x.high_value, x.low_value, x.close_value) == (
        3.0, 5.0, 1.0, 1.0,
    )
    y = out["y"]
    assert (y.open_value, y.close_value) == (7.0, 9.0)


def test_ohlc_bars_cover_all_hours(spark, sf_dir):
    out = events_ohlc_bars(spark, sf_dir)
    row = out.filter(F.col("n_events") >= 1).first()
    assert row.low_value <= row.high_value
    assert row.low_value <= row.open_value <= row.high_value
    assert row.low_value <= row.close_value <= row.high_value


def test_corr_regression_exact_on_perfect_line(spark):
    # y = 3x + 2 exactly: corr=1, slope=3, intercept=2, r2=1.
    rows = [("A", float(x), 3.0 * x + 2.0) for x in range(1, 6)]
    df = spark.createDataFrame(
        rows, ["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    r = df.groupBy("l_returnflag").agg(
        F.round(F.corr(x, y), 6).alias("corr"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    ).first()
    assert (r.corr, r.slope, r.intercept, r.r2) == (1.0, 3.0, 2.0, 1.0)


def test_corr_regression_fixture_shape(spark, sf_dir):
    out = agg_corr_regression(spark, sf_dir).collect()
    assert len(out) == 3  # returnflags A/N/R
    for r in out:
        assert -1.0 <= r.corr_qty_price <= 1.0
        assert 0.0 <= r.regr_r2_price_on_qty <= 1.0
