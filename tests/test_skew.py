"""Salted aggregation / join parity: skew-mitigated forms must produce
exactly the plain forms' results on any input, including a pathological
hot key."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)


def _skewed_df(spark):
    # one hot key (90% of rows) + a long tail
    rows = [Row(k="hot", v=float(i)) for i in range(900)]
    rows += [Row(k=f"cold{i}", v=float(i)) for i in range(100)]
    return spark.createDataFrame(rows).repartition(8)


def test_salted_aggregate_parity(spark):
    df = _skewed_df(spark)
    plain = {
        r.k: (r.n, r.total, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, r.total, r.mx)
        for r in salted_aggregate(
            df,
            "k",
            {"n": ("v", "count"), "total": ("v", "sum"), "mx": ("v", "max")},
            buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_parity(spark):
    facts = _skewed_df(spark)
    dim = spark.createDataFrame(
        [Row(k="hot", name="H")] + [Row(k=f"cold{i}", name=f"C{i}") for i in range(50)]
    )
    plain = sorted(
        (r.k, r.v, r.name) for r in facts.join(dim, "k").collect()
    )
    salted = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(facts, dim, "k", buckets=4).collect()
    )
    assert salted == plain
    # left join keeps unmatched facts exactly once
    dim_partial = spark.createDataFrame([Row(k="hot", name="H")])
    left = salted_join(facts, dim_partial, "k", buckets=4, how="left")
    assert left.count() == facts.count()
    assert left.filter(F.col("name").isNull()).count() == 100


def test_salted_join_rejects_build_preserving_modes(spark):
    """right/full outer would emit `buckets` null-padded copies of
    every unmatched build row — refused loudly."""
    import pytest
    from pyspark.sql import Row

    from solana_etl_pipeline_spark.operators.skew import salted_join

    facts = spark.createDataFrame([Row(k=1, v=1.0)])
    build = spark.createDataFrame([Row(k=2, name="b")])
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError):
            salted_join(facts, build, key="k", how=how)
    # fact-preserving modes stay allowed
    assert salted_join(facts, build, key="k", how="left").count() == 1
