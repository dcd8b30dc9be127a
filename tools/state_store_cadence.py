"""Snapshot-cadence probe for RocksDB changelog checkpointing.

The r14 churn A/B (``state_store_churn_r14.log``) found checkpoint
state bytes ~2x grow mode under churn: eviction tombstones flow into
every per-batch changelog. The knob that trades changelog volume
against snapshot uploads is ``spark.sql.streaming.stateStore.
minDeltasForSnapshot`` (default 10): with changelog checkpointing ON,
the maintenance thread uploads a full RocksDB snapshot only every N
versions, and a restart must load the latest snapshot and REPLAY every
newer changelog. So the cadence sets three coupled costs:

  * checkpoint bytes  = snapshots/N-versions + all retained changelogs
  * steady-state work = snapshot upload amortized over N batches
  * restart replay    = up to N changelogs re-applied before batch 1

This probe measures all three at the churn shape, per cadence, in one
session: a cold availableNow drain over F files (= F micro-batches,
each inserting AND evicting keys), then ONE more landing file of
fresh keys stamped past the drained span and a restart drain — the
restart wall time includes the snapshot load + changelog replay AND
the batch's real state lookups/inserts, the latency a recovering
executor pays for its first batch.

The maintenance interval is dropped to 2 s (default 60 s) so snapshot
uploads actually happen inside a short probe window; at production
batch durations the default interval snapshots at the same VERSION
cadence, just on its own clock. Verified present in this build:
``RocksDBConf`` reads ``minDeltasForSnapshot`` (spark-sql 4.1.2 jar).

Run:  python tools/state_store_cadence.py [--n 4000000] [--files 24]
          [--cadences 2,10,1000] [--span-hours 4] [--workdir D]

Findings land in a dated log next to the r14 churn logs; the capacity
guidance lives on ``session.rocksdb_state_store_confs``.
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from solana_etl_pipeline_spark.session import (  # noqa: E402
    build_session,
    rocksdb_state_store_confs,
)
from tools.state_store_ab import (  # noqa: E402
    build_landing,
    drain_available_now,
)

_VERSIONED = re.compile(r"^(\d+)\.(changelog|zip|delta|snapshot)$")


def checkpoint_breakdown(ckpt: str) -> dict:
    """Per-extension byte/count totals plus restart-replay length.

    Replay length (per state-store partition: newest version minus
    newest snapshot version; 'newest version' itself for a partition
    that never snapshotted — a restart replays from empty) is the
    number of changelogs a recovering store re-applies before it can
    serve batch 1.
    """
    bytes_by_ext: dict[str, int] = defaultdict(int)
    count_by_ext: dict[str, int] = defaultdict(int)
    newest: dict[str, int] = defaultdict(int)
    oldest: dict[str, int] = {}
    newest_snap: dict[str, int] = defaultdict(int)
    for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
        for f in files:
            m = _VERSIONED.match(f)
            path = os.path.join(root, f)
            try:
                size = os.path.getsize(path)
            except OSError:
                continue
            ext = m.group(2) if m else os.path.splitext(f)[1] or f
            bytes_by_ext[ext] += size
            count_by_ext[ext] += 1
            if m:
                v = int(m.group(1))
                newest[root] = max(newest[root], v)
                oldest[root] = min(oldest.get(root, v), v)
                if m.group(2) in ("zip", "snapshot"):
                    newest_snap[root] = max(newest_snap[root], v)
    replay = [newest[r] - newest_snap.get(r, 0) for r in newest]
    return {
        "bytes": dict(bytes_by_ext),
        "counts": dict(count_by_ext),
        "replay_max": max(replay, default=0),
        "replay_mean": sum(replay) / len(replay) if replay else 0.0,
        "newest_version": max(newest.values(), default=0),
        "oldest_version": min(oldest.values(), default=0),
    }


def build_restart_file(
    spark, n: int, out_dir: str, start_epoch: int, span_s: float
) -> None:
    """One landing file of FRESH keys with event times starting at
    ``start_epoch`` — i.e. after the drained span. Event time matters,
    not just arrival mtime: the restored watermark is (span end - the
    1-hour horizon), so events re-stamped inside the span would be
    late-dropped before touching the state store and the restart batch
    would measure replay only, never a recovering executor's real
    lookup+insert work."""
    df = spark.range(n).coalesce(1).select(
        (F.lit(10_000_000_000) + F.col("id")).alias("event_id"),
        F.timestamp_seconds(
            F.lit(start_epoch) + F.col("id") * F.lit(span_s / n)
        ).alias("ts"),
        (F.col("id") % 9973).alias("user_id"),
        F.lit("purchase").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    df.write.mode("overwrite").json(out_dir)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--files", type=int, default=24)
    ap.add_argument("--cadences", default="2,10,1000",
                    help="minDeltasForSnapshot values; 1000 ~= "
                    "changelog-only (no snapshot inside the run)")
    ap.add_argument("--span-hours", type=float, default=4.0)
    ap.add_argument("--retain", type=int, default=None,
                    help="set spark.sql.streaming.minBatchesToRetain "
                    "(build default 100): with --files well past it, "
                    "verifies maintenance cleanup PURGES versions "
                    "older than (newest - retain) so checkpoint bytes "
                    "plateau instead of growing with run length — the "
                    "retained_versions term of the capacity formula")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    cadences = [int(c) for c in args.cadences.split(",")]
    made_tmp = args.workdir is None
    workdir = args.workdir or tempfile.mkdtemp(prefix="state_cadence_")

    spark = build_session(app_name="state-store-cadence")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        _run(spark, args, cadences, workdir)
    finally:
        spark.stop()
        if made_tmp:
            # a user-supplied --workdir is kept for inspection
            shutil.rmtree(workdir, ignore_errors=True)


def _run(spark, args, cadences, workdir: str) -> None:
    for k, v in rocksdb_state_store_confs().items():
        spark.conf.set(k, v)
    # default 60 s would let a short availableNow run finish before a
    # single maintenance pass; 2 s makes the VERSION cadence the only
    # variable under test
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "2s")
    if args.retain is not None:
        spark.conf.set(
            "spark.sql.streaming.minBatchesToRetain", str(args.retain)
        )
    print(f"probe: n={args.n} files={args.files} span={args.span_hours}h "
          f"cadences={cadences} retain={args.retain} "
          f"(churn shape, rocksdb+changelog)",
          flush=True)

    landing = os.path.join(workdir, "landing")
    build_landing(spark, args.n, landing, args.files, args.span_hours)
    extra = os.path.join(workdir, "landing_extra")
    # the restart batch: fresh keys stamped just past the drained span
    # (arrival mtime AND event time after it — late rows would bypass
    # the state store entirely)
    build_restart_file(
        spark, args.n // args.files, extra,
        start_epoch=1704067200 + int(args.span_hours * 3600),
        span_s=args.span_hours * 3600 / args.files,
    )

    # untimed warm-up (JIT, rocksdbjni load, file-source listing)
    warm = os.path.join(workdir, "ckpt_warm")
    drain_available_now(spark, landing, warm, watermark="1 hour")
    shutil.rmtree(warm, ignore_errors=True)

    for cadence in cadences:
        spark.conf.set(
            "spark.sql.streaming.stateStore.minDeltasForSnapshot",
            str(cadence),
        )
        ckpt = os.path.join(workdir, f"ckpt_c{cadence}")
        wall = drain_available_now(spark, landing, ckpt, watermark="1 hour")
        # let the maintenance thread finish any in-flight snapshot
        # upload before sizing the checkpoint
        time.sleep(4.0)
        pre = checkpoint_breakdown(ckpt)
        # restart: copy the extra file into the landing dir so the
        # SAME source path gains one new file; the new query must
        # load the snapshot + replay changelogs, then do the batch's
        # real state lookups/inserts
        for f in os.listdir(extra):
            if f.endswith(".json"):
                dst = os.path.join(landing, f"extra_{f}")
                shutil.copy(os.path.join(extra, f), dst)
                os.utime(dst, (time.time(),) * 2)
        restart_wall = drain_available_now(
            spark, landing, ckpt, watermark="1 hour"
        )
        for f in os.listdir(landing):
            if f.startswith("extra_"):
                os.remove(os.path.join(landing, f))
        post = checkpoint_breakdown(ckpt)
        mb = {k: v / 1e6 for k, v in pre["bytes"].items()}
        parts = ", ".join(
            "{}={:.1f}MB/{}".format(k, v, pre["counts"][k])
            for k, v in sorted(mb.items())
        )
        print(
            f"cadence={cadence}: drain {wall:.1f}s  "
            f"state {sum(mb.values()):.1f}MB ({parts})  "
            f"replay max={pre['replay_max']} mean={pre['replay_mean']:.1f}  "
            f"restart-batch {restart_wall:.1f}s "
            f"(post-restart replay max={post['replay_max']})  "
            f"versions retained {pre['oldest_version']}"
            f"..{pre['newest_version']}",
            flush=True,
        )
        shutil.rmtree(ckpt, ignore_errors=True)


if __name__ == "__main__":
    main()
