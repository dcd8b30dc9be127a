"""Unit tests for the snapshot-diff operator (hand-built snapshots;
oracle parity covers the fixture-backed query)."""

from __future__ import annotations

from solana_etl_pipeline_spark.operators.diff import snapshot_diff


def _frames(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "b", 20),
            (3, "c", 30),
            (4, None, 40),
            (5, "e", 50),
        ],
        ["id", "txt", "n"],
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),        # unchanged -> omitted
            (2, "B", 20),        # changed: txt
            (3, "c", 31),        # changed: n
            (4, "d", 41),        # changed: txt (null->d) + n
            (6, "f", 60),        # added
        ],
        ["id", "txt", "n"],
    )
    return old, new


def test_diff_classifies_all_change_types(spark):
    old, new = _frames(spark)
    out = {
        r.id: r for r in snapshot_diff(old, new, ["id"], ["txt", "n"]).collect()
    }
    assert set(out) == {2, 3, 4, 5, 6}  # 1 is unchanged, omitted
    assert (out[2].change_type, out[2].changed_cols) == ("changed", "txt")
    assert (out[3].change_type, out[3].changed_cols) == ("changed", "n")
    assert (out[4].change_type, out[4].changed_cols) == ("changed", "txt,n")
    assert (out[5].change_type, out[5].changed_cols) == ("removed", "")
    assert (out[6].change_type, out[6].changed_cols) == ("added", "")


def test_diff_null_equals_null(spark):
    old = spark.createDataFrame([(1, None)], "id: long, txt: string")
    new = spark.createDataFrame([(1, None)], "id: long, txt: string")
    assert snapshot_diff(old, new, ["id"], ["txt"]).count() == 0


def test_diff_identical_snapshots_empty(spark, sf_dir):
    from solana_etl_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = snapshot_diff(
        docs, docs, ["doc_id"], ["text", "lang", "source", "n_chars"]
    )
    assert out.count() == 0
