"""Tests for the self-banded approx_percentile quantile sketch query:
the band is on the RANK guarantee (the sketch's actual contract), not
on value distance — pinned by a gappy distribution where the value gap
is huge but the rank flag still holds."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from solana_etl_pipeline_spark.queries import aggs as qaggs


def _events(spark, values):
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), "t", float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, ["event_id", "ts", "event_type", "value"]
    )


def test_rank_flags_hold_on_gappy_distribution(spark, monkeypatch):
    # Median sits at a value cliff: half the mass at ~1, half at ~1000.
    # Any element near rank n/2 is a "correct" answer by rank even
    # though candidate values differ by ~999 — the flag must hold.
    values = [1.0 + i * 1e-6 for i in range(50)] + [
        1000.0 + i * 1e-6 for i in range(50)
    ]
    monkeypatch.setattr(
        qaggs, "load_table", lambda spark_, sf_, name: _events(spark, values)
    )
    out = qaggs.sketch_quantile_approx(spark, "unused").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_values == 100
    assert r.p50_rank_ok and r.p90_rank_ok


def test_rank_flags_hold_on_fixture(spark, sf_dir):
    out = qaggs.sketch_quantile_approx(spark, sf_dir).collect()
    assert len(out) >= 1
    for r in out:
        assert r.p50_rank_ok and r.p90_rank_ok, r.event_type
        assert r.exact_p50 <= r.exact_p90


def test_rank_check_rejects_wrong_quantile(spark, monkeypatch):
    """The band is real: feeding p90's element into the p50 check (a
    rank-440 error at n=500, slack ~1) must trip the flag."""
    values = [float(i) for i in range(500)]
    ev = _events(spark, values)
    n = 500
    ap90 = 450.0  # rank ~450; target p50 rank is 250
    slack = n / qaggs.APPROX_PCT_ACC + 1
    below = ev.filter(F.col("value") < ap90).count()
    at_or_below = ev.filter(F.col("value") <= ap90).count()
    ok = (below <= 0.5 * n + slack) and (at_or_below >= 0.5 * n - slack)
    assert not ok
