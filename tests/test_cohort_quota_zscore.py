"""Unit tests for quota sampling, cohort retention, and the trailing
z-score window (hand-computed fixtures; oracle parity covers the
fixture tables)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.export import SHARD_P, shard_scramble
from solana_etl_pipeline_spark.llm.mixture import quota_sample


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_quota_sample_exact_k_and_small_groups(spark):
    rows = [("big", i) for i in range(100)] + [("small", 1000 + i) for i in range(3)]
    df = spark.createDataFrame(rows, ["source", "doc_id"])
    out = quota_sample(df, "source", "doc_id", k=10)
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src["big"]) == 10
    assert len(by_src["small"]) == 3  # min(k, n)
    # ranks are 1..n in scramble order
    ranks = sorted(r.sample_rank for r in by_src["big"])
    assert ranks == list(range(1, 11))


def test_quota_sample_matches_scramble_order_ground_truth(spark):
    rows = [("s", i) for i in range(50)]
    df = spark.createDataFrame(rows, ["source", "doc_id"])
    picked = {
        r.sample_rank: r.doc_id
        for r in quota_sample(df, "source", "doc_id", k=7).collect()
    }
    knuth = 2654435761 % SHARD_P
    expect = sorted(range(50), key=lambda i: ((i % SHARD_P) * knuth) % SHARD_P)[:7]
    assert [picked[i + 1] for i in range(7)] == expect


def test_quota_sample_partition_invariant(spark):
    rows = [(f"s{i % 4}", i) for i in range(200)]
    df = spark.createDataFrame(rows, ["source", "doc_id"])
    a = {tuple(r) for r in quota_sample(df, "source", "doc_id", 5).collect()}
    b = {
        tuple(r)
        for r in quota_sample(
            df.repartition(13, "doc_id"), "source", "doc_id", 5, salt_buckets=3
        ).collect()
    }
    assert a == b


def test_cohort_retention_hand_case(spark, monkeypatch):
    from solana_etl_pipeline_spark.queries import analytics

    rows = [
        # user 1: first week W0 (Mon 2024-01-01), active W0 and W2
        (1, _ts("2024-01-02T10:00:00")),
        (1, _ts("2024-01-03T10:00:00")),   # same week, dedups
        (1, _ts("2024-01-16T10:00:00")),
        # user 2: first week W1, active W1 only
        (2, _ts("2024-01-08T00:00:00")),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    monkeypatch.setattr(
        analytics, "load_table", lambda spark_, sf_, name: df
    )
    out = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in analytics.events_cohort_retention(spark, "unused").collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_trailing_zscore_hand_case(spark, monkeypatch):
    from solana_etl_pipeline_spark.queries import windows as qwindows

    # 6 events in one series within one hour: the 6th sees all six.
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 12.0]
    rows = [
        (i, _ts(f"2024-01-01T10:{i:02d}:00"), "m", vals[i])
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    monkeypatch.setattr(
        qwindows, "load_table", lambda spark_, sf_, name: df
    )
    out = {r.event_id: r for r in qwindows.window_trailing_zscore(spark, "unused").collect()}

    # events 0-3 have windows of size < 5 -> null zscore
    for i in range(4):
        assert out[i].zscore is None
        assert out[i].n_window == i + 1
    # event 5: window = all six values
    mean = sum(vals) / 6
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / 5)
    assert out[5].n_window == 6
    assert abs(out[5].zscore - round((12.0 - mean) / sd, 6)) < 1e-9


def test_trailing_zscore_zero_spread_is_null(spark, monkeypatch):
    from solana_etl_pipeline_spark.queries import windows as qwindows

    rows = [
        (i, _ts(f"2024-01-01T10:{i:02d}:00"), "m", 7.0) for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    monkeypatch.setattr(
        qwindows, "load_table", lambda spark_, sf_, name: df
    )
    out = qwindows.window_trailing_zscore(spark, "unused")
    assert all(r.zscore is None for r in out.collect())


def test_trailing_zscore_frame_expires_old_events(spark, monkeypatch):
    from solana_etl_pipeline_spark.queries import windows as qwindows

    # 5 early events, then one 2 hours later: its window holds only itself.
    rows = [
        (i, _ts(f"2024-01-01T10:{i:02d}:00"), "m", float(i)) for i in range(5)
    ] + [(9, _ts("2024-01-01T13:00:00"), "m", 100.0)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    monkeypatch.setattr(
        qwindows, "load_table", lambda spark_, sf_, name: df
    )
    out = {r.event_id: r for r in qwindows.window_trailing_zscore(spark, "unused").collect()}
    assert out[9].n_window == 1
    assert out[9].zscore is None
