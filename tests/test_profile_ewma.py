"""Hand-computed unit tests for the EWMA smoother, referential-
integrity audit, column profiler, and label centroids (oracle parity
on the fixture tables is covered by tests/test_oracle_parity.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_ewma_weights_and_gap_behavior(spark, monkeypatch):
    import solana_etl_pipeline_spark.queries.timeseries as mod

    rows = [
        # series A: consecutive hours 10:xx and 11:xx
        (1, 1, _ts("2024-01-01T10:00:00"), "A", 10.0),
        (2, 1, _ts("2024-01-01T11:00:00"), "A", 20.0),
        # series B: a gap far beyond the 20-hour horizon
        (3, 2, _ts("2024-01-01T00:00:00"), "B", 5.0),
        (4, 2, _ts("2024-01-03T00:00:00"), "B", 7.0),  # +48h
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value"]
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: df)
    out = {
        (r.event_type, r.hour): r
        for r in mod.events_ewma_hourly(spark, "x").collect()
    }
    w0, w1 = mod.EWMA_WEIGHTS[0], mod.EWMA_WEIGHTS[1]
    # hour 10: only itself
    a10 = out[("A", "2024-01-01 10:00:00")]
    assert a10.n_contrib == 1 and abs(a10.ewma_value - 10.0) < 1e-9
    # hour 11: (w0*20 + w1*10) / (w0 + w1)
    a11 = out[("A", "2024-01-01 11:00:00")]
    assert a11.n_contrib == 2
    assert abs(a11.ewma_value - round((w0 * 20 + w1 * 10) / (w0 + w1), 6)) < 1e-9
    # series B: the 48-hour-old point is outside the horizon entirely
    b = out[("B", "2024-01-03 00:00:00")]
    assert b.n_contrib == 1 and abs(b.ewma_value - 7.0) < 1e-9


def test_ref_integrity_counts_planted_orphan(spark, monkeypatch):
    import solana_etl_pipeline_spark.queries.quality as mod

    tables = {
        "lineitem": spark.createDataFrame(
            [(1, 10, 100), (1, 11, 100), (2, 10, 999)],  # suppkey 999 orphan
            ["l_orderkey", "l_partkey", "l_suppkey"],
        ),
        "orders": spark.createDataFrame([(1, 5), (2, 5)], ["o_orderkey", "o_custkey"]),
        "part": spark.createDataFrame([(10,), (11,)], ["p_partkey"]),
        "supplier": spark.createDataFrame([(100, 1)], ["s_suppkey", "s_nationkey"]),
        "customer": spark.createDataFrame([(5, 1)], ["c_custkey", "c_nationkey"]),
        "nation": spark.createDataFrame([(1,)], ["n_nationkey"]),
    }
    monkeypatch.setattr(mod, "load_table", lambda s, d, name: tables[name])
    out = {r.relationship: r for r in mod.data_ref_integrity(spark, "x").collect()}
    supp = out["lineitem.l_suppkey -> supplier.s_suppkey"]
    assert supp.n_rows == 3 and supp.n_orphans == 1 and not supp.intact
    assert all(
        r.intact for k, r in out.items() if "l_suppkey" not in k
    )


def test_profile_reports_nulls_distinct_and_typed_minmax(spark, monkeypatch):
    import solana_etl_pipeline_spark.queries.quality as mod

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 7, "a", 1.5, None),
        (2, _ts("2024-02-01T00:00:00"), 7, "b", None, "{}"),
        (3, _ts("2024-01-15T00:00:00"), None, "b", 3.25, "{}"),
    ]
    df = spark.createDataFrame(rows, schema)
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: df)
    out = {
        r.column_name: r
        for r in mod.profile_events_columns(spark, "x").collect()
    }
    assert out["user_id"].n_nulls == 1 and out["user_id"].n_distinct == 1
    assert out["value"].n_nulls == 1 and out["value"].min_num == 1.5
    assert out["value"].max_num == 3.25 and out["value"].min_text is None
    assert out["ts"].min_text == "2024-01-01 00:00:00"
    assert out["ts"].max_text == "2024-02-01 00:00:00"
    assert out["event_type"].n_distinct == 2
    assert out["event_type"].min_text == "a" and out["event_type"].max_text == "b"
    assert out["props"].n_nulls == 1
    assert all(r.n_rows == 3 for r in out.values())


def test_label_centroids_hand_computed(spark, monkeypatch):
    import solana_etl_pipeline_spark.queries.classify as mod

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [3.0, 2.0], 0),
            (3, [5.0, 5.0], 1),
            (4, None, 1),  # null vector excluded
        ],
        ["vec_id", "embedding", "label"],
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: df)
    out = {
        (r.label, r.dim): r
        for r in mod.llm_label_centroids(spark, "x").collect()
    }
    assert out[(0, 0)].centroid == 2.0 and out[(0, 1)].centroid == 1.0
    assert out[(0, 0)].n_vectors == 2
    assert out[(1, 0)].centroid == 5.0 and out[(1, 0)].n_vectors == 1


def test_seasonal_anomalies_hand_residuals(spark, monkeypatch):
    import solana_etl_pipeline_spark.queries.timeseries as mod

    # Two Mondays 10:00 at 10 and 20 → seasonal 15, residuals ±5;
    # one Tuesday 10:00 singleton → residual 0.
    rows = [
        (1, 1, _ts("2024-01-01T10:00:00"), "A", 10.0),  # Monday
        (2, 1, _ts("2024-01-08T10:00:00"), "A", 20.0),  # Monday
        (3, 1, _ts("2024-01-02T10:00:00"), "A", 99.0),  # Tuesday
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value"]
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: df)
    out = {r.event_id: r for r in mod.events_seasonal_anomalies(spark, "x").collect()}
    assert out[1].seasonal == 15.0 and out[1].residual == -5.0
    assert out[2].residual == 5.0 and out[2].n_obs == 2
    assert out[3].residual == 0.0 and out[3].n_obs == 1
    # ordering: |5| ties broken by event_id, residual-0 row last
    assert [r.event_id for r in mod.events_seasonal_anomalies(spark, "x").collect()] == [1, 2, 3]


def test_hll_overlap_exact_sets_and_flag(spark, monkeypatch):
    import solana_etl_pipeline_spark.queries.aggs as mod

    # A-users {1..100}, B-users {51..150} → overlap 50, union 150.
    rows = [(i, "A") for i in range(1, 101)] + [
        (i, "B") for i in range(51, 151)
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type"]).selectExpr(
        "user_id", "event_type", "timestamp('2024-01-01 00:00:00') AS ts"
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: df)
    out = mod.sketch_hll_overlap(spark, "x").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.et_a, r.et_b) == ("A", "B")
    assert r.exact_a == 100 and r.exact_b == 100 and r.exact_overlap == 50
    # at these cardinalities HLL is near-exact — the 5%-of-union band holds
    assert r.overlap_est_ok


def test_vocab_overlap_hand_jaccard(spark, monkeypatch):
    import solana_etl_pipeline_spark.queries.curation as mod

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "s1"),
            (2, "beta beta delta", "s1"),  # dup 'beta' collapses
            (3, "beta gamma epsilon", "s2"),
        ],
        ["doc_id", "text", "source"],
    )
    monkeypatch.setattr(mod, "load_table", lambda s, d, n: docs)
    out = mod.llm_source_vocab_overlap(spark, "x").collect()
    assert len(out) == 1
    r = out[0]
    # s1 vocab {alpha,beta,gamma,delta}=4; s2 {beta,gamma,epsilon}=3;
    # common {beta,gamma}=2; union 5 → jaccard 0.4
    assert (r.src_a, r.src_b) == ("s1", "s2")
    assert r.n_a == 4 and r.n_b == 3 and r.n_common == 2
    assert abs(r.jaccard - 0.4) < 1e-9
