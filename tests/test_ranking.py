"""Unit tests for TF-IDF / BM25 ranking on a hand-built corpus with
known term statistics, plus null/empty-text robustness.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from solana_etl_pipeline_spark.llm.ranking import (
    BM25_B,
    BM25_K1,
    bm25_topk,
    idf_bm25,
    idf_smooth,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """4 docs, engineered stats:

    - 'common' appears in every doc (df=4),
    - 'rare' only in doc 0 (df=1), three times (tf=3),
    - 'pair' in docs 1 and 2 (df=2).
    """
    rows = [
        Row(doc_id=0, text="rare rare rare common"),
        Row(doc_id=1, text="pair common common"),
        Row(doc_id=2, text="pair common"),
        Row(doc_id=3, text="common"),
    ]
    return spark.createDataFrame(rows)


def test_tfidf_rare_term_wins(corpus):
    out = tfidf_top_terms(corpus, "doc_id", "text", k=2)
    rows = {(r.doc_id, r.rank): (r.term, r.tfidf) for r in out.collect()}
    # doc 0: rare (tf=3, df=1) must outrank common (tf=1, df=4).
    assert rows[(0, 1)][0] == "rare"
    assert rows[(0, 2)][0] == "common"
    expect_rare = round(3 * idf_smooth(4, 1), 4)
    assert rows[(0, 1)][1] == pytest.approx(expect_rare, abs=1e-4)
    # doc 3 has a single term; no rank-2 row exists.
    assert (3, 1) in rows and (3, 2) not in rows


def test_tfidf_tie_break_is_term_ascending(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="beta alpha")]
    )  # equal tf and df -> tie broken alphabetically
    out = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    assert [r.term for r in sorted(out, key=lambda r: r.rank)] == [
        "alpha",
        "beta",
    ]


def test_bm25_exact_score_and_order(corpus):
    out = bm25_topk(corpus, ["rare", "pair"], "doc_id", "text", k=4)
    got = {r.doc_id: (r.rank, r.bm25) for r in out.collect()}
    # Docs without any query term (doc 3) are absent.
    assert set(got) == {0, 1, 2}

    dls = {0: 4, 1: 3, 2: 2}
    avgdl = (4 + 3 + 2 + 1) / 4.0

    def contrib(tf, df, dl):
        idf = idf_bm25(4, df)
        return (
            idf
            * (tf * (BM25_K1 + 1.0))
            / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
        )

    expect = {
        0: contrib(3, 1, dls[0]),
        1: contrib(1, 2, dls[1]),
        2: contrib(1, 2, dls[2]),
    }
    for doc, score in expect.items():
        assert got[doc][1] == pytest.approx(round(score, 4), abs=1e-4)
    order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][0])]
    assert order == sorted(expect, key=lambda d: -expect[d])


def test_ranking_tolerates_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="alpha beta"),
            Row(doc_id=1, text=None),
            Row(doc_id=2, text=""),
        ]
    )
    tfidf = tfidf_top_terms(df, "doc_id", "text", k=3)
    assert {r.doc_id for r in tfidf.collect()} == {0}
    bm25 = bm25_topk(df, ["alpha"], "doc_id", "text", k=5)
    assert [r.doc_id for r in bm25.collect()] == [0]


def test_idf_twins_match_definitions():
    assert idf_smooth(10, 1) == pytest.approx(math.log(11 / 2) + 1)
    assert idf_bm25(10, 1) == pytest.approx(math.log((9.5 / 1.5) + 1))
