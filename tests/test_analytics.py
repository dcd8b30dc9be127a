"""Unit tests for the histogram-quantile rollup and the ordered
funnel — hand-built event sets with hand-computed expectations."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.operators.funnel import ordered_funnel
from solana_etl_pipeline_spark.operators.sketches import (
    range_quantile_estimates,
    value_histogram_rollup,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=ts,
                user_id=uid,
                event_type=et,
                value=float(v),
                props="{}",
            )
            for i, (ts, uid, et, v) in enumerate(rows)
        ]
    )


# --- histogram quantiles -------------------------------------------------


def test_histogram_rollup_bins_and_clamp(spark):
    d1 = dt.datetime(2024, 3, 1, 12)
    rows = [
        (d1, 1, "view", 0.0),     # bin 0
        (d1, 1, "view", 7.99),    # bin 0 (width 8)
        (d1, 1, "view", 8.0),     # bin 1
        (d1, 1, "view", 600.0),   # clamped into the last bin
        (d1, 1, "view", -5.0),    # clamped into bin 0
    ]
    roll = {
        (r.day.isoformat(), r.bin): r.n
        for r in value_histogram_rollup(
            _ev(spark, rows), n_bins=64, lo=0.0, hi=512.0
        ).collect()
    }
    assert roll == {
        ("2024-03-01", 0): 3,
        ("2024-03-01", 1): 1,
        ("2024-03-01", 63): 1,
    }


def test_range_quantiles_hand_computed_with_day_pruning(spark):
    """10 in-range values spread over two days (plus an out-of-range
    day that must be pruned): p50 rank 5 lands in bin 1, p90 rank 9 in
    bin 3; estimates are bin midpoints."""
    d1 = dt.datetime(2024, 3, 1, 1)
    d2 = dt.datetime(2024, 3, 2, 1)
    d_out = dt.datetime(2024, 3, 9, 1)
    vals_d1 = [1.0, 2.0, 3.0, 9.0, 10.0]   # bins 0,0,0,1,1
    vals_d2 = [11.0, 17.0, 18.0, 25.0, 30.0]  # bins 1,2,2,3,3
    rows = [(d1, 1, "view", v) for v in vals_d1]
    rows += [(d2, 1, "view", v) for v in vals_d2]
    rows += [(d_out, 1, "view", 400.0)] * 50  # would shift everything
    roll = value_histogram_rollup(_ev(spark, rows), n_bins=64)
    got = {
        r.q: (r.rank, r.total, r.est)
        for r in range_quantile_estimates(
            roll,
            qs=(0.5, 0.9),
            start_day="2024-03-01",
            end_day="2024-03-05",
        ).collect()
    }
    # width 8: bin midpoints 4.0, 12.0, 20.0, 28.0
    assert got[0.5] == (5, 10, 12.0)   # cum: bin0=3, bin1=6 -> bin 1
    assert got[0.9] == (9, 10, 28.0)   # cum reaches 9 at bin 3


def test_range_quantiles_exact_boundary_rank_is_integer_exact(spark):
    """q*total on an exact integer boundary: rank must be exactly
    q*total (ceil of the true rational), not one above — the
    pure-BIGINT formulation cannot drift an ulp."""
    d1 = dt.datetime(2024, 3, 1, 1)
    rows = [(d1, 1, "view", float(8 * i)) for i in range(10)]  # 10 rows
    roll = value_histogram_rollup(_ev(spark, rows), n_bins=64)
    got = {
        r.q: r.rank
        for r in range_quantile_estimates(roll, qs=(0.5, 0.9)).collect()
    }
    assert got[0.5] == 5 and got[0.9] == 9


# --- ordered funnel ------------------------------------------------------


def _t(minute: int, day: int = 1) -> dt.datetime:
    return dt.datetime(2024, 4, day, 10, 0, 0) + dt.timedelta(minutes=minute)


def test_funnel_orders_and_budget(spark):
    rows = [
        # user 1 completes all three in order
        (_t(0), 1, "signup", 1.0),
        (_t(5), 1, "click", 1.0),
        (_t(9), 1, "purchase", 1.0),
        # user 2: click BEFORE signup (doesn't count), none after
        (_t(0), 2, "click", 1.0),
        (_t(5), 2, "signup", 1.0),
        # user 3: signup + click, purchase OUTSIDE the 7-day budget
        (_t(0), 3, "signup", 1.0),
        (_t(10), 3, "click", 1.0),
        (_t(0, day=9), 3, "purchase", 1.0),
        # user 4: purchase then click then signup (all out of order)
        (_t(0), 4, "purchase", 1.0),
        (_t(1), 4, "click", 1.0),
        (_t(2), 4, "signup", 1.0),
    ]
    got = {
        r.step_idx: (r.step, r.n_users, r.conversion)
        for r in ordered_funnel(_ev(spark, rows)).collect()
    }
    assert got[1] == ("signup", 4, 1.0)
    assert got[2] == ("click", 2, 0.5)      # users 1 and 3
    assert got[3] == ("purchase", 1, 0.25)  # user 1 only
    # redelivery duplicates must not change anything (min is idempotent)
    dup = _ev(spark, rows + rows[:3])
    got_dup = {
        r.step_idx: r.n_users for r in ordered_funnel(dup).collect()
    }
    assert got_dup == {1: 4, 2: 2, 3: 1}


def test_funnel_greedy_earliest_completion_maximizes_budget(spark):
    """Step-2 completion is the EARLIEST qualifying click; a user whose
    later click would push the purchase past its window still
    converts, because min(ts) anchors the earliest chain."""
    rows = [
        (_t(0), 1, "signup", 1.0),
        (_t(1), 1, "click", 1.0),
        (_t(60), 1, "click", 1.0),
        (_t(30), 1, "purchase", 1.0),  # after first click, before 2nd
    ]
    got = {
        r.step_idx: r.n_users
        for r in ordered_funnel(_ev(spark, rows)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_transition_matrix_hand_computed(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from solana_etl_pipeline_spark.queries.analytics import (
        events_transition_matrix,
    )

    t0 = dt.datetime(2024, 2, 1, 9, 0, 0)
    rows = [
        # user 1: a -> b -> a  (transitions a>b, b>a)
        (1, t0, 1, "a", 1.0),
        (2, t0 + dt.timedelta(minutes=1), 1, "b", 1.0),
        (3, t0 + dt.timedelta(minutes=2), 1, "a", 1.0),
        # user 2: a -> b      (a>b)
        (4, t0, 2, "a", 1.0),
        (5, t0 + dt.timedelta(minutes=1), 2, "b", 1.0),
        # user 3: same-ts tie, event_id order: a(6) -> c(7)
        (6, t0, 3, "a", 1.0),
        (7, t0, 3, "c", 1.0),
        # user 4: single event, no transitions
        (8, t0, 4, "z", 1.0),
    ]
    out = tmp_path_factory.mktemp("trans_sf")
    table = pa.Table.from_pylist(
        [
            {"event_id": e, "ts": ts, "user_id": u, "event_type": et,
             "value": v, "props": "{}"}
            for (e, ts, u, et, v) in rows
        ],
        schema=pa.schema(
            [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
             ("user_id", pa.int64()), ("event_type", pa.string()),
             ("value", pa.float64()), ("props", pa.string())]
        ),
    )
    pq.write_table(table, out / "events.parquet")
    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.p_transition)
        for r in events_transition_matrix(spark, str(out)).collect()
    }
    # from a: 2x a>b, 1x a>c (tie resolved by event_id); from b: 1x b>a
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
    }


def test_pareto_top_parts_cumulative(spark, sf_dir):
    from solana_etl_pipeline_spark.queries.analytics import (
        pareto_top_parts,
    )

    rows = pareto_top_parts(spark, sf_dir).collect()
    assert len(rows) == 100
    rows.sort(key=lambda r: r.part_rank)
    # ranks are 1..100, revenue non-increasing, share non-decreasing <= 1
    assert [r.part_rank for r in rows] == list(range(1, 101))
    for a, b in zip(rows, rows[1:]):
        assert a.revenue >= b.revenue
        assert a.cum_share <= b.cum_share
    assert rows[0].cum_revenue == rows[0].revenue
    assert 0 < rows[-1].cum_share <= 1.0
    # cumulative really accumulates
    assert abs(
        rows[1].cum_revenue - (rows[0].revenue + rows[1].revenue)
    ) < 0.01


def test_attribution_last_touch_hand(spark, monkeypatch):
    import datetime as dt

    import solana_etl_pipeline_spark.queries.analytics as mod

    base = dt.datetime(2024, 1, 10, 12, 0, 0)

    def ev(eid, uid, minutes, et, v=1.0):
        return (eid, uid, base + dt.timedelta(minutes=minutes), et, v)

    rows = [
        # user 1: click 5 min before purchase → attributed to click
        ev(1, 1, 0, "click"), ev(2, 1, 5, "purchase", 10.0),
        # user 2: view 8 days before purchase → outside budget → (none)
        ev(3, 2, 0, "view"), ev(4, 2, 8 * 1440, "purchase", 20.0),
        # user 3: purchase with no prior events → (none)
        ev(5, 3, 0, "purchase", 30.0),
        # user 4: view then click then purchase → LAST touch (click) wins
        ev(6, 4, 0, "view"), ev(7, 4, 1, "click"), ev(8, 4, 2, "purchase", 40.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value"]
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: df)
    out = {r.touch_type: r for r in mod.attribution_last_touch(spark, "x").collect()}
    assert out["click"].n_purchases == 2
    assert abs(out["click"].attributed_value - 50.0) < 1e-9
    # lags: 5 min (user 1) and 1 min (user 4, click at +1 → purchase
    # at +2) → avg 3.0
    assert abs(out["click"].avg_minutes_to_convert - 3.0) < 1e-9
    assert out["(none)"].n_purchases == 2
    assert out["(none)"].avg_minutes_to_convert is None
    assert "view" not in out  # never the LAST touch


def test_orders_mom_revenue_deltas(spark, monkeypatch):
    import datetime as dt

    import solana_etl_pipeline_spark.queries.analytics as mod

    rows = [
        (1, 1, "O", 100.0, dt.datetime(2024, 1, 5), "P"),
        (2, 1, "O", 50.0, dt.datetime(2024, 1, 20), "P"),
        (3, 1, "O", 300.0, dt.datetime(2024, 2, 1), "P"),
    ]
    df = spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: df)
    out = {r.month: r for r in mod.orders_mom_revenue(spark, "x").collect()}
    assert out["2024-01"].revenue == 150.0
    assert out["2024-01"].mom_delta is None  # first month has no prior
    assert out["2024-02"].mom_delta == 150.0
    assert abs(out["2024-02"].mom_pct - 100.0) < 1e-9


def test_order_fulfillment_latency_bands(spark, monkeypatch):
    import datetime as dt

    import solana_etl_pipeline_spark.queries.analytics as mod

    d0 = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(1, 1, "O", 100.0, d0, "P"), (2, 1, "O", 200.0, d0, "P")],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    )
    li = spark.createDataFrame(
        [
            # order 1: lines ship day 3 and day 6 → last ship 6 → a_week
            (1, d0 + dt.timedelta(days=3)), (1, d0 + dt.timedelta(days=6)),
            # order 2: ships day 45 → c_quarter
            (2, d0 + dt.timedelta(days=45)),
        ],
        ["l_orderkey", "l_shipdate"],
    )
    tables = {"orders": orders, "lineitem": li}
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: tables[n])
    out = {r.latency_band: r for r in mod.order_fulfillment_latency(spark, "x").collect()}
    assert out["a_week"].n_orders == 1 and out["a_week"].max_days == 6
    assert out["c_quarter"].n_orders == 1 and out["c_quarter"].min_days == 45
    assert abs(out["a_week"].avg_order_value - 100.0) < 1e-9
