"""Incremental near-dup: signature store semantics across batches,
retry idempotence, and the foreachBatch streaming wiring.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.incremental import incremental_near_dup_batch

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "in the warm sun and the birds sing in the tall green trees near "
    "the old stone wall by the river bank"
)
OTHER = (
    "completely different content about databases query planners "
    "shuffle partitions and columnar execution engines with vectorized "
    "operators and adaptive plans running on large clusters today"
)


def test_incremental_detects_cross_batch_and_within_batch(spark, tmp_path):
    store = str(tmp_path / "store")
    b1 = spark.createDataFrame(
        [Row(doc_id=0, text=BASE), Row(doc_id=1, text=OTHER)]
    )
    v1 = incremental_near_dup_batch(b1, store, batch_id=0).collect()
    assert v1 == []  # two distinct docs, empty store

    b2 = spark.createDataFrame(
        [
            Row(doc_id=10, text=BASE.replace("lazy", "sleepy")),  # ~dup of 0
            Row(doc_id=11, text="entirely novel text with fresh words only"),
            Row(doc_id=12, text="entirely novel text with fresh words only"),
        ]
    )
    v2 = incremental_near_dup_batch(b2, store, batch_id=1).collect()
    got = {(r.new_id, r.dup_of): (r.scope, r.est_jaccard) for r in v2}
    assert got[(10, 0)][0] == "index"  # found against batch-0 index
    assert got[(10, 0)][1] >= 0.5
    assert got[(12, 11)] == ("batch", 1.0)  # within-batch exact copy
    assert set(got) == {(10, 0), (12, 11)}

    # batch 3 sees BOTH earlier batches in the index
    b3 = spark.createDataFrame([Row(doc_id=20, text=OTHER)])
    v3 = incremental_near_dup_batch(b3, store, batch_id=2).collect()
    assert {(r.new_id, r.dup_of, r.scope) for r in v3} == {(20, 1, "index")}


def test_incremental_probe_cap_identity_and_hot_bucket(spark, tmp_path):
    """max_probe_per_bucket: identity when buckets are small, bounded
    fan-out with detection preserved when an arrival hits a
    mass-duplicated store bucket."""
    # identity: same corpus as the cross-batch test, cap far above
    # any bucket size
    store_a = str(tmp_path / "store_a")
    b1 = spark.createDataFrame(
        [Row(doc_id=0, text=BASE), Row(doc_id=1, text=OTHER)]
    )
    incremental_near_dup_batch(b1, store_a, batch_id=0)
    b2 = spark.createDataFrame(
        [Row(doc_id=10, text=BASE.replace("lazy", "sleepy"))]
    )
    capped = incremental_near_dup_batch(
        b2, store_a, batch_id=1, max_probe_per_bucket=100
    ).collect()
    assert {(r.new_id, r.dup_of, r.scope) for r in capped} == {
        (10, 0, "index")
    }

    # hot bucket: 30 indexed clones, then one clone arrival with k=2 —
    # candidates are bounded to the bucket's smallest store ids, and
    # the duplicate is still detected at est 1.0
    store_b = str(tmp_path / "store_b")
    clones = spark.createDataFrame(
        [Row(doc_id=i, text=BASE) for i in range(30)]
    )
    incremental_near_dup_batch(clones, store_b, batch_id=0)
    arrival = spark.createDataFrame([Row(doc_id=100, text=BASE)])
    verdicts = incremental_near_dup_batch(
        arrival, store_b, batch_id=1, max_probe_per_bucket=2
    ).collect()
    assert 0 < len(verdicts) <= 2  # bounded, never the 30-row fan-out
    assert all(
        r.new_id == 100 and r.est_jaccard == 1.0 and r.scope == "index"
        and r.dup_of in (0, 1)
        for r in verdicts
    )


def test_incremental_batch_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch with the same batch_id (foreachBatch retry)
    overwrites its own partitions: no duplicate signatures, identical
    verdicts, and later batches still match exactly once."""
    store = str(tmp_path / "store")
    b1 = spark.createDataFrame([Row(doc_id=0, text=BASE)])
    incremental_near_dup_batch(b1, store, batch_id=0)
    incremental_near_dup_batch(b1, store, batch_id=0)  # replay

    sigs = spark.read.parquet(str(tmp_path / "store" / "sigs"))
    assert sigs.count() == 1  # not doubled

    b2 = spark.createDataFrame([Row(doc_id=5, text=BASE)])
    v2 = incremental_near_dup_batch(b2, store, batch_id=1).collect()
    assert [(r.new_id, r.dup_of) for r in v2] == [(5, 0)]  # exactly once


def test_incremental_inside_foreach_batch_stream(spark, tmp_path):
    """End-to-end wiring: landing JSON -> readStream -> foreachBatch
    incremental dedup; two availableNow drains with a shared
    checkpoint index each file once and flag the cross-arrival dup."""
    landing = tmp_path / "landing"
    landing.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(landing))
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, epoch: incremental_near_dup_batch(
                    df, store, batch_id=epoch
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (landing / "a.json").write_text(
        json.dumps({"doc_id": 0, "text": BASE}) + "\n"
    )
    drain()
    (landing / "b.json").write_text(
        json.dumps({"doc_id": 100, "text": BASE.replace("lazy", "sleepy")})
        + "\n"
    )
    drain()

    verdicts = spark.read.parquet(str(tmp_path / "store" / "verdicts"))
    rows = verdicts.collect()
    assert {(r.new_id, r.dup_of, r.scope) for r in rows} == {
        (100, 0, "index")
    }
    sigs = spark.read.parquet(str(tmp_path / "store" / "sigs"))
    assert sigs.count() == 2  # each arrival indexed exactly once


def test_incremental_empty_batch_is_noop(spark, tmp_path):
    """An epoch with nothing signable (empty, or all-null text) must
    not create fileless store dirs that wedge later batches."""
    store = str(tmp_path / "store")
    empty = spark.createDataFrame([], "doc_id long, text string")
    v = incremental_near_dup_batch(empty, store, batch_id=0).collect()
    assert v == []
    nulls = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert incremental_near_dup_batch(nulls, store, batch_id=1).collect() == []
    # a later real batch proceeds normally against the (still empty) store
    b = spark.createDataFrame([Row(doc_id=2, text=BASE)])
    assert incremental_near_dup_batch(b, store, batch_id=2).collect() == []


def test_incremental_store_param_mismatch_raises(spark, tmp_path):
    store = str(tmp_path / "store")
    b = spark.createDataFrame([Row(doc_id=0, text=BASE)])
    incremental_near_dup_batch(b, store, batch_id=0, num_hashes=64, bands=16)
    with pytest.raises(ValueError, match="num_hashes=64"):
        incremental_near_dup_batch(
            b, store, batch_id=1, num_hashes=32, bands=8
        )
