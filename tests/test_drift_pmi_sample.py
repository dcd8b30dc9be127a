"""Unit tests for the PSI drift report, PMI collocations, and the
Efraimidis–Spirakis weighted sample (hand-built fixtures; the
oracle-parity gate covers the fixture-table queries)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.export import KNUTH, SHARD_P
from solana_etl_pipeline_spark.llm.mixture import weighted_sample
from solana_etl_pipeline_spark.llm.ranking import pmi_bigrams
from solana_etl_pipeline_spark.operators.drift import psi_report


# ---------------------------------------------------------------- PSI


def _psi_frame(spark):
    rows = []
    # group g: identical uniform ref and cur -> PSI ~ 0
    for i in range(10):
        rows.append(("g", float(i) + 0.5, False))
        rows.append(("g", float(i) + 0.5, True))
    # group h: uniform ref, current collapsed onto one bin -> high PSI
    for i in range(10):
        rows.append(("h", float(i) + 0.5, False))
        rows.append(("h", 9.5, True))
    # clamping: current values outside the reference envelope
    rows.append(("g", 100.0, True))   # above max -> bin 9
    rows.append(("g", -5.0, True))    # below min -> bin 0
    # group with no reference rows: must be dropped
    rows.append(("nocal", 1.0, True))
    # constant reference (mn == mx): everything in bin 0, no NaN
    rows.append(("const", 5.0, False))
    rows.append(("const", 5.0, True))
    return spark.createDataFrame(rows, ["grp", "v", "cur"])


def test_psi_stable_vs_shifted_groups(spark):
    out = psi_report(
        _psi_frame(spark), "grp", "v", F.col("cur"), n_bins=10
    ).collect()
    by_grp: dict[str, list] = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r)
    assert set(by_grp) == {"g", "h", "const"}  # nocal dropped
    assert all(len(v) == 10 for v in (by_grp["g"], by_grp["h"]))

    g_psi = sum(r.psi_term for r in by_grp["g"])
    h_psi = sum(r.psi_term for r in by_grp["h"])
    assert g_psi < 0.05          # stable
    assert h_psi > 0.25          # broken
    # psi terms are individually finite
    assert all(math.isfinite(r.psi_term) for r in out)


def test_psi_clamps_out_of_range_current(spark):
    out = {
        (r.bin_idx): r
        for r in psi_report(
            _psi_frame(spark), "grp", "v", F.col("cur"), n_bins=10
        ).collect()
        if r.grp == "g"
    }
    # 10 uniform cur rows + one clamped low into bin 0, one high into 9
    assert out[0].cur_count == 2
    assert out[9].cur_count == 2
    assert sum(out[b].cur_count for b in range(10)) == 12
    assert sum(out[b].ref_count for b in range(10)) == 10


def test_psi_constant_reference_no_nan(spark):
    rows = [r for r in psi_report(
        _psi_frame(spark), "grp", "v", F.col("cur"), n_bins=10
    ).collect() if r.grp == "const"]
    assert len(rows) == 10
    binned = {r.bin_idx: r for r in rows}
    assert (binned[0].ref_count, binned[0].cur_count) == (1, 1)
    assert all(math.isfinite(r.psi_term) for r in rows)


# ---------------------------------------------------------------- PMI


def test_pmi_hand_computed(spark):
    docs = spark.createDataFrame(
        [("a b",)] * 6 + [("a c",)] * 6, ["text"]
    )
    out = pmi_bigrams(docs, "text", min_count=5, k=10).collect()
    # T=24 tokens (a:12 b:6 c:6), B=12 bigrams, c_xy=6 each:
    # pmi = ln(6*24*24 / (12*12*6)) = ln(4)
    want = round(math.log(4.0), 6)
    assert [(r.w1, r.w2, r.c_xy, r.pmi) for r in out] == [
        ("a", "b", 6, want),
        ("a", "c", 6, want),
    ]


def test_pmi_min_count_filters(spark):
    docs = spark.createDataFrame(
        [("x y",)] * 4 + [("p q",)] * 5, ["text"]
    )
    out = pmi_bigrams(docs, "text", min_count=5, k=10).collect()
    assert [(r.w1, r.w2) for r in out] == [("p", "q")]


def test_pmi_negative_for_anti_associated(spark):
    # w appears often, z appears often, but "w z" only at threshold:
    # joint probability far below independence -> negative PMI
    # T=210 (w:55, z:55), B=105, c_wz=5:
    # pmi = ln(5*210^2 / (105*55*55)) = ln(0.694) < 0
    docs = (
        [("w a",)] * 50 + [("b z",)] * 50 + [("w z",)] * 5
    )
    out = {
        (r.w1, r.w2): r.pmi
        for r in pmi_bigrams(
            spark.createDataFrame(docs, ["text"]), "text",
            min_count=5, k=10,
        ).collect()
    }
    assert out[("w", "z")] < 0


# ------------------------------------------------------- weighted ES


def _es_key(doc_id: int, w: float) -> float:
    s = ((doc_id % SHARD_P) * (KNUTH % SHARD_P)) % SHARD_P
    u = (s + 1) / float(SHARD_P + 1)
    return round(math.log(u) / max(w, 1.0), 9)


def test_weighted_sample_matches_python_twin(spark):
    rows = [(i, float(10 * i + 1)) for i in range(1, 51)]
    df = spark.createDataFrame(rows, ["doc_id", "wt"])
    got = [
        (r.doc_id, r.es_key)
        for r in weighted_sample(df, "doc_id", "wt", k=10).collect()
    ]
    want = sorted(
        ((i, _es_key(i, w)) for i, w in rows),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert got == want


def test_weighted_sample_prefers_heavy_rows(spark):
    # 100 light rows (w=1) vs 100 heavy rows (w=1000): the top-20
    # should be dominated by heavy ids (P(light in top) ~ tiny)
    rows = [(i, 1.0) for i in range(100)] + [
        (i, 1000.0) for i in range(100, 200)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "wt"])
    top = weighted_sample(df, "doc_id", "wt", k=20).collect()
    heavy = sum(1 for r in top if r.doc_id >= 100)
    assert heavy >= 18


def test_weighted_sample_partition_invariant(spark):
    rows = [(i, float(i % 7 + 1)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["doc_id", "wt"])
    a = weighted_sample(df, "doc_id", "wt", k=15).collect()
    b = weighted_sample(df.repartition(7), "doc_id", "wt", k=15).collect()
    assert [(r.doc_id, r.es_key) for r in a] == [
        (r.doc_id, r.es_key) for r in b
    ]


def test_weighted_sample_null_and_zero_weights_clamp(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 0.0), (3, -4.0), (4, 2.0)],
        "doc_id: bigint, wt: double",
    )
    out = {r.doc_id: r.es_key for r in
           weighted_sample(df, "doc_id", "wt", k=10).collect()}
    assert len(out) == 4
    assert out[1] == _es_key(1, 1.0)
    assert out[2] == _es_key(2, 1.0)
    assert out[3] == _es_key(3, 1.0)
    assert out[4] == _es_key(4, 2.0)


def test_weighted_sample_take_ordered_plan(spark):
    df = spark.createDataFrame([(1, 1.0)], ["doc_id", "wt"])
    plan = (
        weighted_sample(df, "doc_id", "wt", k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
