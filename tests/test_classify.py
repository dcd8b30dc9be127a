"""Unit tests for the NB classifier and SemDeDup semantic dedup —
crafted corpora with hand-computed expectations (the registry queries
are additionally oracle-checked by the driver-mirror parity gate and
the hostile-fixture gate)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.classify import (
    nb_fit,
    nb_label_stats,
    nb_score,
)
from solana_etl_pipeline_spark.llm.similarity import kmeans_fit, semantic_dedup


# --- Naive Bayes ---------------------------------------------------------


def _corpus(spark):
    rows = [
        Row(doc_id=0, source="spam", text="buy now buy cheap"),
        Row(doc_id=1, source="spam", text="cheap buy offer"),
        Row(doc_id=2, source="ham", text="meeting notes agenda"),
        Row(doc_id=3, source="ham", text="agenda for the meeting"),
    ]
    return spark.createDataFrame(rows)


def test_nb_classifies_separable_corpus(spark):
    docs = _corpus(spark)
    model = nb_fit(docs)
    stats = nb_label_stats(docs)
    got = {
        r.doc_id: r.predicted for r in nb_score(docs, model, stats).collect()
    }
    assert got == {0: "spam", 1: "spam", 2: "ham", 3: "ham"}


def test_nb_score_matches_hand_computation(spark):
    """Score of doc 0 under 'spam', recomputed in plain Python from
    the published formula: ln(docs_l/D) + Σ ln(c+1) - n·ln(N_l+V)."""
    docs = _corpus(spark)
    model = nb_fit(docs)
    stats = nb_label_stats(docs)
    [row] = (
        nb_score(docs, model, stats)
        .filter(F.col("doc_id") == 0)
        .collect()
    )
    # spam counts: buy=3, cheap=2, now=1, offer=1 -> N_spam=7
    # global vocab: buy cheap now offer meeting notes agenda for the = 9
    # doc 0 tokens: buy now buy cheap (n=4)
    expected = (
        math.log(2 / 4)
        + (2 * math.log(3 + 1) + math.log(1 + 1) + math.log(2 + 1))
        - 4 * math.log(7 + 9)
    )
    assert row.predicted == "spam"
    assert abs(row.nb_score - round(expected, 6)) < 1e-9


def test_nb_tokenless_doc_classified_by_prior(spark):
    """Null/empty-text docs have zero tokens: score reduces to
    ln(prior), so the majority label wins (ties -> smallest label)."""
    rows = [
        Row(doc_id=0, source="big", text="alpha beta"),
        Row(doc_id=1, source="big", text="beta gamma"),
        Row(doc_id=2, source="big", text="gamma alpha"),
        Row(doc_id=3, source="small", text="delta epsilon"),
        Row(doc_id=4, source="small", text=None),
        Row(doc_id=5, source="small", text="   "),
    ]
    docs = spark.createDataFrame(rows)
    got = {
        r.doc_id: (r.predicted, r.nb_score)
        for r in nb_score(docs, nb_fit(docs), nb_label_stats(docs)).collect()
    }
    # doc 4 and 5 carry no tokens -> score reduces to ln(prior).
    # Priors TIE at 3/6 each, so this also pins the tie-break: the
    # lexicographically smaller label ('big') wins deterministically.
    assert got[4][0] == "big" and got[5][0] == "big"
    assert got[4][1] == round(math.log(3 / 6), 6)
    # every document receives exactly one verdict
    assert set(got) == {0, 1, 2, 3, 4, 5}


def test_nb_rounded_argmax_is_deterministic_under_repartition(spark):
    docs = _corpus(spark)
    a = sorted(
        map(tuple, nb_score(docs, nb_fit(docs), nb_label_stats(docs)).collect())
    )
    docs7 = docs.repartition(7)
    b = sorted(
        map(
            tuple,
            nb_score(docs7, nb_fit(docs7), nb_label_stats(docs7)).collect(),
        )
    )
    assert a == b


# --- semantic dedup ------------------------------------------------------


def _clustered_embeddings(spark, n_per: int = 30, dim: int = 8):
    """3 clusters around orthogonal axes + planted exact copies.
    Noise σ=0.05 puts organic cluster-mate cosine ≈ 1 - dim·σ² ≈ 0.98
    — comfortably BELOW the 0.999 dedup threshold (σ=0.01 would put
    them above it and organic pairs would be legitimate finds)."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for axis in range(3):
        center = np.zeros(dim)
        center[axis] = 1.0
        for _ in range(n_per):
            v = center + rng.normal(0, 0.05, dim)
            rows.append(Row(vec_id=vid, embedding=[float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows), vid


def test_semantic_dedup_finds_planted_copies_and_only_those(spark):
    emb, n = _clustered_embeddings(spark)
    copies = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + n).alias("vec_id"), "embedding"
    )
    aug = emb.unionByName(copies)
    centroids = kmeans_fit(aug, k=3, dim=8, n_iters=2)
    got = semantic_dedup(aug, centroids, threshold=0.999).collect()
    planted = {(r.keep_id, r.drop_id) for r in got if r.drop_id >= n}
    assert planted == {(i, i + n) for i in range(5)}
    for r in got:
        assert r.cos_sim >= 0.999
        assert r.keep_id < r.drop_id


def test_semantic_dedup_within_cluster_pairs_only(spark):
    """In-cluster 0.999-cosine near-twins are found; vectors from
    different orthogonal clusters (cosine ~0) never pair."""
    emb, n = _clustered_embeddings(spark)
    centroids = kmeans_fit(emb, k=3, dim=8, n_iters=2)
    got = semantic_dedup(emb, centroids, threshold=0.9).collect()
    # cluster membership by construction: vec_id // 30
    for r in got:
        assert r.keep_id // 30 == r.drop_id // 30


def test_semantic_dedup_null_and_zero_vectors_never_pair(spark):
    """The norm guard: a zero vector's cosine is NaN, and Spark orders
    NaN ABOVE every double — without the explicit filter it would
    'duplicate' everything in its cluster. Null embeddings must also
    vanish silently."""
    emb, n = _clustered_embeddings(spark, n_per=10)
    hostile = spark.createDataFrame(
        [
            Row(vec_id=9000, embedding=None),
            Row(vec_id=9001, embedding=[0.0] * 8),
        ]
    )
    centroids = kmeans_fit(emb, k=3, dim=8, n_iters=2)
    got = semantic_dedup(
        emb.unionByName(hostile), centroids, threshold=0.9
    ).collect()
    ids = {r.keep_id for r in got} | {r.drop_id for r in got}
    assert 9000 not in ids and 9001 not in ids
