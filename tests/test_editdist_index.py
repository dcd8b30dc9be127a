"""Unit tests for the blocked edit-distance detector and the capped
inverted-index build (hand-computed corpora; the oracle-parity gate
covers the fixture tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.dedup import edit_distance_near_dup
from solana_etl_pipeline_spark.llm.ranking import inverted_index


def test_edit_distance_finds_small_edits(spark):
    base = "the quick brown fox jumps over the lazy dog " * 2
    rows = [
        (1, base),
        (2, base.replace("lazy", "hazy")),          # 2 edits (x2 occurrences)
        (3, base.replace("jumps", "leaps")),        # few edits
        (4, "completely different text that still " + "x" * 50),
        (5, None),                                  # null text dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = edit_distance_near_dup(
        df, "doc_id", "text", len_bucket=32, prefix_chars=16, max_dist=10
    )
    pairs = {(r.id_a, r.id_b): r.edit_distance for r in out.collect()}
    assert pairs[(1, 2)] == 2
    assert (1, 3) in pairs and 1 <= pairs[(1, 3)] <= 10
    assert all(4 not in p and 5 not in p for p in pairs)


def test_edit_distance_blocking_is_part_of_semantics(spark):
    # Same text but the FIRST char differs -> different prefix block,
    # so the pair is a by-design miss even at distance 1.
    t = "a" + "hello world " * 10
    rows = [(1, t), (2, "b" + t[1:])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = edit_distance_near_dup(
        df, "doc_id", "text", len_bucket=32, prefix_chars=16, max_dist=10
    )
    assert out.count() == 0


def test_edit_distance_threshold_excludes_far_pairs(spark):
    # Same block (same prefix, same length bucket) but > max_dist edits.
    pre = "common prefix 16c "
    rows = [(1, pre + "x" * 40), (2, pre + "y" * 40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    far = edit_distance_near_dup(
        df, "doc_id", "text", len_bucket=32, prefix_chars=16, max_dist=10
    )
    assert far.count() == 0
    near = edit_distance_near_dup(
        df, "doc_id", "text", len_bucket=32, prefix_chars=16, max_dist=40
    )
    assert [(r.id_a, r.id_b, r.edit_distance) for r in near.collect()] == [
        (1, 2, 40)
    ]


def test_inverted_index_postings_and_stats(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "apple cherry"),
        (3, "banana banana banana apple"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.term: r for r in inverted_index(df, "doc_id", "text", 2).collect()}

    assert set(out) == {"apple", "banana", "cherry"}
    apple = out["apple"]
    assert (apple.doc_freq, apple.total_tf) == (3, 4)
    # top-2 postings by tf desc, doc asc: doc 1 (tf=2), then doc 2/3
    # tie at tf=1 broken by doc id -> doc 2.
    assert apple.top_doc_ids == "1,2"

    banana = out["banana"]
    assert (banana.doc_freq, banana.total_tf) == (2, 4)
    assert banana.top_doc_ids == "3,1"

    cherry = out["cherry"]
    assert (cherry.doc_freq, cherry.total_tf, cherry.top_doc_ids) == (
        1, 1, "2",
    )


def test_inverted_index_is_windowless_salted_topk(spark, sf_dir):
    """Scale pin: the posting top-k is the salted two-phase aggregate —
    NO per-term window (a Zipf-hot term would funnel its whole posting
    set through one task's sort), and every stage hash-aggregates."""
    from solana_etl_pipeline_spark.queries.ranking import llm_inverted_index

    plan = (
        llm_inverted_index(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_inverted_index_salting_invariant(spark):
    """Partial top-k then merge equals the unsalted result for every
    salt_buckets choice (exactness of the two-phase decomposition)."""
    rows = [
        (i, ("hot " * (1 + i % 7)) + f"cold{i} rare{i % 3}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    base = {
        tuple(r)
        for r in inverted_index(df, "doc_id", "text", 4, salt_buckets=1)
        .collect()
    }
    for s in (2, 7, 16):
        salted = {
            tuple(r)
            for r in inverted_index(df, "doc_id", "text", 4, salt_buckets=s)
            .collect()
        }
        assert salted == base, s
