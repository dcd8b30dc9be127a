"""BPE trainer/encoder tests (llm/bpe.py) against the hand-computable
Sennrich et al. running example (low / lower): merge order, ties,
greedy non-overlap, early stop, and encode on unseen words.
"""

from __future__ import annotations

from pyspark.sql import Row

from solana_etl_pipeline_spark.llm.bpe import (
    _merge_seq,
    bpe_encode,
    bpe_fit,
)


def test_fit_reproduces_hand_computed_merges(spark):
    """low×5 lower×2: pair counts (l,o)=7 (o,w)=7 (w,</w>)=5
    (w,e)=(e,r)=(r,</w>)=2. Round-by-round argmax with the
    (count, lexicographic) tie-break gives exactly:
    (l,o) [tie vs (o,w), 'l' < 'o'] → (lo,w) → (low,</w>) →
    (e,r) [3-way tie at 2, 'e' < 'low' < 'r']."""
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="low low low low low lower lower")]
    )
    assert bpe_fit(docs, 4) == [
        ("l", "o"),
        ("lo", "w"),
        ("low", "</w>"),
        ("e", "r"),
    ]


def test_fit_stops_when_no_pair_repeats(spark):
    """Every pair unique (count 1 < 2): zero merges learned no matter
    the budget."""
    docs = spark.createDataFrame([Row(doc_id=0, text="abc xyz")])
    assert bpe_fit(docs, 10) == []


def test_encode_applies_merges_to_unseen_words(spark):
    """The learned table generalizes: 'lowest' (never trained)
    still compresses its 'low' prefix; trained words compress fully."""
    train = spark.createDataFrame(
        [Row(doc_id=0, text="low low low low low lower lower")]
    )
    merges = bpe_fit(train, 4)
    enc = {
        r.doc_id: (r.bpe_tokens, r.n_bpe_tokens)
        for r in bpe_encode(
            spark.createDataFrame(
                [
                    Row(doc_id=1, text="lowest lower low"),
                    Row(doc_id=2, text=None),
                ]
            ),
            merges,
        ).collect()
    }
    assert enc[1] == (
        ["low", "e", "s", "t", "</w>", "low", "er", "</w>", "low</w>"],
        9,
    )
    assert enc[2] == ([], 0)


def test_merge_seq_greedy_non_overlapping():
    """'aaa' with merge (a,a): the greedy left-to-right scan merges
    the FIRST pair and leaves the third symbol — never re-consumes
    the freshly merged token (the paper's scan)."""
    assert _merge_seq(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_seq(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert _merge_seq(["x"], "a", "a") == ["x"]
