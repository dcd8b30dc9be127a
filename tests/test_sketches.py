"""HLL sketch-rollup tests (``operators/sketches.py``) and the
dynamic-partition-overwrite maintenance primitive.

The sketch estimate has no SQL oracle; what IS exactly checkable:
merging per-day sketches gives the *identical* estimate to sketching
the raw range directly (HLL union is lossless), and the estimate lands
within the configured error envelope of the exact distinct count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from solana_etl_pipeline_spark.operators.sketches import (
    hll_daily_user_sketches,
    hll_range_estimate,
)
from solana_etl_pipeline_spark.pipelines.maintenance import (
    overwrite_day_partitions,
)
from solana_etl_pipeline_spark.sources import load_table


def test_rollup_union_equals_direct_sketch(spark, sf_dir):
    """Rollup-then-union must reproduce the direct sketch estimate
    exactly — the property that makes per-day rollups a safe substitute
    for re-scanning raw history."""
    ev = load_table(spark, sf_dir, "events")
    daily = hll_daily_user_sketches(ev)
    via_rollup = hll_range_estimate(daily).collect()[0]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    assert via_rollup["distinct_users_est"] == direct
    assert via_rollup["n_events"] == ev.count()


def test_estimate_within_error_envelope(spark, sf_dir):
    """Default lgConfigK=12 → ~1.6% standard error; assert a generous
    5% envelope against the exact distinct count."""
    ev = load_table(spark, sf_dir, "events")
    est = hll_range_estimate(hll_daily_user_sketches(ev)).collect()[0][
        "distinct_users_est"
    ]
    exact = ev.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_range_filter_scopes_days(spark, sf_dir):
    """A half-open day range unions only the covered sketches."""
    ev = load_table(spark, sf_dir, "events")
    daily = hll_daily_user_sketches(ev).cache()
    try:
        days = sorted(r["day"] for r in daily.select("day").collect())
        assert len(days) >= 2, "fixture spans multiple days"
        cut = days[len(days) // 2]
        first = hll_range_estimate(daily, end_day=str(cut)).collect()[0]
        rest = hll_range_estimate(daily, start_day=str(cut)).collect()[0]
        assert first["n_days"] + rest["n_days"] == len(days)
        assert first["n_events"] + rest["n_events"] == ev.count()
    finally:
        daily.unpersist()


def test_overwrite_day_partitions_is_scoped_and_idempotent(spark, tmp_path):
    """Dynamic overwrite replaces exactly the restated day's partition:
    other days' bytes are untouched, and a rerun converges (no
    append-duplication)."""
    path = str(tmp_path / "by_day")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    overwrite_day_partitions(spark, ev, path)
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    target = str(days[0])
    restated = ev.filter(F.col("day") == target).withColumn(
        "value", F.col("value") * 2
    )
    overwrite_day_partitions(spark, restated, path)
    overwrite_day_partitions(spark, restated, path)  # idempotent rerun
    out = spark.read.parquet(path)
    assert out.count() == ev.count()
    doubled = out.filter(F.col("day") == F.lit(target)).agg(
        F.sum("value").alias("s")
    ).collect()[0]["s"]
    original = ev.filter(F.col("day") == F.lit(target)).agg(
        F.sum("value").alias("s")
    ).collect()[0]["s"]
    assert abs(doubled - 2 * original) < 1e-6
    untouched = out.filter(F.col("day") != F.lit(target)).agg(
        F.sum("value").alias("s")
    ).collect()[0]["s"]
    untouched_src = ev.filter(F.col("day") != F.lit(target)).agg(
        F.sum("value").alias("s")
    ).collect()[0]["s"]
    assert abs(untouched - untouched_src) < 1e-6


def test_approx_top_k_under_pressure_keeps_dominant_item(spark):
    """With maxItemsTracked below the distinct count the sketch may
    approximate tail counts, but a heavily dominant item must survive
    with a sane estimate (the frequent-items guarantee the heavy-
    hitters query leans on when cardinality exceeds the budget)."""
    from pyspark.sql import functions as F

    # 400 copies of 'hot', 100 singleton terms, track only 8
    rows = [("hot",)] * 400 + [(f"t{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "term string")
    out = (
        df.agg(F.expr("approx_top_k(term, 3, 8)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("term"), F.col("e.count").alias("n"))
        .collect()
    )
    got = {r.term: r.n for r in out}
    assert "hot" in got
    assert 300 <= got["hot"] <= 500
