"""Data-quality gate, text normalization, and sampling tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.textstats import normalize_text
from solana_etl_pipeline_spark.operators.quality import (
    constraint_report,
    split_by_constraints,
)
from solana_etl_pipeline_spark.sources import load_table


def test_split_by_constraints(spark):
    df = spark.createDataFrame(
        [
            Row(a=1, b="x"),
            Row(a=-1, b="x"),
            Row(a=2, b=None),
            Row(a=-5, b=None),
        ]
    )
    constraints = {
        "a_positive": F.col("a") > 0,
        "b_present": F.col("b").isNotNull(),
    }
    clean, violations = split_by_constraints(df, constraints)
    assert clean.count() == 1
    v = {r.a: list(r.failed_constraints) for r in violations.collect()}
    assert v[-1] == ["a_positive"]
    assert v[2] == ["b_present"]
    assert v[-5] == ["a_positive", "b_present"]

    report = {
        r.constraint_name: r.violations
        for r in constraint_report(df, constraints).collect()
    }
    assert report == {"a_positive": 2, "b_present": 2}


def test_normalize_text_collapses_variants(spark):
    df = spark.createDataFrame(
        [
            Row(t="Hello,  World!"),
            Row(t="hello world"),
            Row(t="HELLO ... world"),
        ]
    )
    out = df.select(normalize_text(F.col("t")).alias("n")).collect()
    assert {r.n for r in out} == {"hello world"}


def test_stratified_sample_proportions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    totals = {r.lang: r.n for r in docs.groupBy("lang")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    fractions = {"en": 0.5, "es": 0.25, "de": 0.25, "fr": 0.1, "zh": 0.1}
    sampled = docs.sampleBy("lang", fractions, seed=42)
    got = {r.lang: r.n for r in sampled.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, frac in fractions.items():
        if lang not in totals:
            continue
        expected = totals[lang] * frac
        # Bernoulli sampling: allow a generous band around the mean
        assert got.get(lang, 0) <= totals[lang]
        if totals[lang] >= 50:
            assert abs(got.get(lang, 0) - expected) < totals[lang] * 0.25
    # determinism: same seed -> same sample
    again = {r.lang: r.n for r in docs.sampleBy("lang", fractions, seed=42)
             .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == got
