"""SparkSession construction with scale-appropriate defaults.

Centralizes the engine's execution posture so every entry point (tests,
bench, pipelines, the driver contract) runs with the same optimizer
settings:

- AQE on (runtime re-planning, skew-join handling, partition coalescing),
- non-ANSI SQL semantics: the reference relies on coerce-to-null numeric
  casts (``pd.to_numeric(errors='coerce')``, reference
  ``clean_data.py:318-320``); Spark 4 defaults ANSI on, so we pin it off
  and additionally prefer ``try_cast``-style expressions in operators,
- UTC session timezone: timestamps are stored/compared as UTC instants;
  PST rendering (reference ``clean_data.py:27-34``) is a display-edge
  concern handled by ``functions.timestamps``.
"""

from __future__ import annotations

import functools
import os
import re
import subprocess

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied to *any* session the engine touches
# (including a driver-owned session handed to `__spark_entry__.queries`).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas interchange (Pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # r16 (guide §3.1/§9): let the planner pick shuffled-hash join when
    # its build-side size conditions hold — skips the per-partition
    # sorts a sort-merge join pays. The planner still falls back to
    # SMJ when no side can build a local hash map, AQE skew handling
    # applies to both, and join RESULTS are strategy-independent.
    # r17 validation at the driver's core count (VERDICT r16 item 2):
    # interleaved 5-pair A/B at cpus=32 over 14 SMJ-bearing queries
    # (dsir, q9, q16, q2, q11, hll overlap, simhash… — tools/conf_ab.py,
    # tools/logs/r17_smj_ab.json): geomean min-ratio false/true = 0.982,
    # worst single query +7.7% (within that session's noise band), so
    # the posture KEEPS. Robustness trade (ADVICE r16): SHJ builds an
    # in-memory hash map per build-side partition and cannot
    # sort-spill through a mis-estimated or skewed build side the way
    # SMJ can — at 100 TB a planner misestimate becomes task-OOM risk
    # rather than slow-but-done. The planner's size conditions plus
    # AQE skew splitting bound that exposure; deployments that would
    # rather pay the SMJ sorts for worst-case robustness should flip
    # this back to true and force SHJ per-join via SHUFFLE_HASH hints
    # where measured.
    "spark.sql.join.preferSortMergeJoin": "false",
    # Local/driver-session sizing: 32 shuffle partitions matches the
    # local[32] core budget (AQE coalesces further). On a cluster,
    # override to ~2-3x total executor cores at session build time.
    "spark.sql.shuffle.partitions": "32",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime SQL confs to an existing session.

    Safe and idempotent; used on sessions we did not build (driver
    contract) so correctness-critical semantics (ANSI off, UTC) hold.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Non-runtime conf on this build — leave builder-time value.
            pass
    return spark


#: OSS Spark's RocksDB state-store provider (the rocksdbjni native
#: bundle ships inside the Spark distribution — no extra install).
ROCKSDB_STATE_STORE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_state_store_confs(
    changelog_checkpointing: bool = True,
    max_memory_mb: int | None = None,
    snapshot_cadence: int | None = None,
) -> dict[str, str]:
    """SQL confs selecting the RocksDB streaming state store.

    The default HDFS-backed provider keeps EVERY live state key
    (dedup keys within the watermark, open windows, join buffers) in
    executor heap — at 100 TB-scale streaming state that is the same
    executor-OOM class :func:`gc_java_opts` fences for Arrow, except
    no GC tuning saves it: the fix is moving state off-heap.
    RocksDB keeps the working set in native memory + local SST files
    and spills to disk, bounding heap usage regardless of key count.

    ``changelog_checkpointing=True`` uploads per-batch changelogs to
    the checkpoint instead of full RocksDB snapshots — at large state
    sizes the snapshot upload otherwise dominates micro-batch latency
    (background snapshots still bound replay length). The conf is
    emitted for BOTH values, so applying ``False`` on a session that
    previously enabled it genuinely turns it off.

    ``max_memory_mb`` additionally CAPS RocksDB's native usage
    (block cache + memtables, shared across all state-store
    instances on an executor) via the bounded-memory-usage knobs:
    without it RocksDB's working set, while off-heap, can still grow
    with hot state and evict the OS page cache. Size it alongside
    ``spark.executor.memoryOverhead`` — the cap must fit inside the
    overhead allowance or the container OOM-kills instead of the
    JVM. Left off by default: the right number is a deployment
    decision (state size × executor density), not an engine one.

    ``snapshot_cadence`` sets ``spark.sql.streaming.stateStore.
    minDeltasForSnapshot`` (build default 10): with changelog
    checkpointing on, the maintenance thread uploads a full snapshot
    only every N versions, and a restart replays up to N changelogs
    on top of the latest snapshot. None leaves the build default.

    **Checkpoint-bytes capacity guidance** (measured at the 4 M-event
    churn point, 24 micro-batches, ``tools/state_store_cadence.py``,
    log ``tools/logs/state_store_cadence_r15.log``, 2026-08-16):
    within the retention window (``minBatchesToRetain``, default 100
    versions) checkpoint bytes decompose as

    * changelogs: per-batch inserts AND evictions — under churn the
      eviction tombstones ~double changelog volume vs grow-only state
      (r14 churn A/B); 106.5 MB here, identical across cadences;
    * snapshots: a full copy of live state every ``cadence`` versions
      — 246 MB at cadence 2, 100 MB at the default 10, zero at
      changelog-only (cadence > versions retained).

    So MORE frequent snapshots cost checkpoint storage (357 vs 208 vs
    107 MB total) and buy restart latency: replay length 1 / 5 / 25
    changelogs, restart batch 2.5 / 2.4 / 3.7 s (a real first batch:
    snapshot load + changelog replay + fresh-key inserts). The build
    default 10 was the balanced point; raise it only if checkpoint
    storage (not executor memory) is the binding constraint and the
    recovery SLO tolerates ``cadence × changelog-replay`` on restore.
    Budget checkpoint capacity as ``retained_versions ×
    churn_bytes_per_batch + (retained_versions / cadence) ×
    live_state_bytes``, where ``retained_versions`` is
    ``spark.sql.streaming.minBatchesToRetain`` (default 100), NOT run
    length: maintenance cleanup purging versions older than
    (newest − retain) is verified by the probe's ``--retain`` mode
    (60-batch run, retain 8 → versions 50..61 on disk, bytes
    plateaued; same log).

    Both confs are runtime-settable (``spark.conf.set``) and are read
    at streaming-query start, so an existing session can opt in
    per-query; keep the provider consistent across restarts of the
    same checkpoint. Verified against a real executor-JVM boundary by
    ``tools/local_cluster_smoke.py`` and locally by
    ``tests/test_streaming_rocksdb.py``.
    """
    confs = {
        "spark.sql.streaming.stateStore.providerClass":
            ROCKSDB_STATE_STORE_PROVIDER,
        # Always emitted (never omitted-when-False): applying these
        # confs to a session where changelog checkpointing was
        # previously enabled must actually DISABLE it, not silently
        # inherit the stale setting (ADVICE r14).
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled":
            str(bool(changelog_checkpointing)).lower(),
    }
    if max_memory_mb is not None:
        confs[
            "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage"
        ] = "true"
        confs[
            "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"
        ] = str(max_memory_mb)
    if snapshot_cadence is not None:
        confs[
            "spark.sql.streaming.stateStore.minDeltasForSnapshot"
        ] = str(snapshot_cadence)
    return confs


@functools.lru_cache(maxsize=1)
def _java_major_version() -> int | None:
    """Major version of the JVM Spark will launch, or None if the
    probe fails (no java on PATH/JAVA_HOME, unparseable banner)."""
    java_home = os.environ.get("JAVA_HOME", "")
    java = os.path.join(java_home, "bin", "java") if java_home else "java"
    try:
        out = subprocess.run(
            [java, "-version"], capture_output=True, text=True, timeout=15
        )
    except Exception:
        return None
    m = re.search(r'version "(\d+)', (out.stderr or "") + (out.stdout or ""))
    return int(m.group(1)) if m else None


def gc_java_opts() -> str:
    """JVM options mitigating the r11 rehearsal's executor-OOM class
    (G1 + JNI-critical Arrow buffers — see the comment at the
    ``build_session`` driver-opts site).

    The GCLocker retry knob is a JDK-17-era *diagnostic* flag tied to
    the GCLocker itself, which JDK 22's G1 region pinning (JEP 423)
    removes — on later JDKs the unrecognized ``-XX`` option would
    abort JVM startup. So it is gated on a ``java -version`` probe
    (included only for major ≤ 21; omitted when the probe fails —
    failing open on a flag the JVM may reject would brick every entry
    point). ``-XX:G1HeapRegionSize`` is a stable product flag and is
    always included: 32 MB regions keep the observed ~4.5 MB Arrow
    task buffers below G1's humongous-allocation threshold.
    """
    opts = []
    major = _java_major_version()
    if major is not None and major <= 21:
        opts += [
            "-XX:+UnlockDiagnosticVMOptions",
            "-XX:GCLockerRetryAllocationCount=8",
        ]
    opts.append("-XX:G1HeapRegionSize=32m")
    return " ".join(opts)


def build_session(
    app_name: str = "solana-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    for test/bench runs; on a real cluster, leave it unset and let
    spark-submit own deployment. ``shuffle_partitions`` defaults to the
    local core count for small scale factors — at 100 TB you would size
    this to ~2-3x total executor cores (AQE coalesces the excess).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or (32 if cpus == "*" else int(cpus))),
        )
        # Local-mode niceties; harmless on a cluster.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # G1 + JNI-critical (Arrow) interplay: under heavy concurrent
        # Arrow traffic the GCLocker can starve multi-MB allocations
        # into retry failure, and at the default 4 MB G1 region size
        # the observed ~4.5 MB task buffers are "humongous"
        # allocations that G1 satisfies least gracefully. Both showed
        # up as the r11 third-decade rehearsal's executor OOM (8
        # simultaneous "Retried waiting for GCLocker too often
        # allocating ~560k words" warnings, then heap-space OOM —
        # COVERAGE.md convention 7). Retry budget up from the JDK-17
        # default of 2; 32 MB regions make ~4 MB buffers regular
        # allocations. See gc_java_opts() for the JDK-version gate on
        # the diagnostic GCLocker knob. No semantic effect. The env
        # vars REPLACE (not append to) these defaults, as does a
        # later extra_confs entry for the same key — callers carrying
        # their own spark-defaults extraJavaOptions must merge by
        # hand.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_DRIVER_JAVA_OPTS", gc_java_opts()),
        )
        # Mirror into executor JVMs: in local mode executors live in
        # the driver JVM and this is inert, but on a real cluster the
        # Arrow/GCLocker allocation pressure happens in EXECUTOR JVMs
        # — without the mirror the OOM-class fix would silently not
        # apply where it matters (ADVICE r11).
        .config(
            "spark.executor.extraJavaOptions",
            os.environ.get("SPARK_EXECUTOR_JAVA_OPTS", gc_java_opts()),
        )
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # r17 (guide §1 "empirical loop" + VERDICT r16 item 5): Spark's
        # whole-stage-codegen class cache is a STATIC conf defaulting
        # to 100 entries; a session serving this engine's 173-query
        # registry emits far more than 100 distinct codegen units per
        # sweep, so the default evicts everything before any query
        # repeats and every execution pays Janino compile + fresh JIT
        # again. Measured (tools/codegen_cache_probe.py, cpus=32,
        # 40-query subset, 3 sweeps in one session): warm sweeps
        # 31.6-33.8 s at 100 entries vs 24.2-24.5 s at 5000 (−23%,
        # ~0.19 s/query of recompilation). This caches COMPILED CODE,
        # never data or results — every execution still computes from
        # the parquet inputs. Memory cost is metaspace-resident class
        # objects (~100 KB/unit worst case); size to the distinct
        # query count × ~10 units. Overridable for small-heap
        # deployments via SPARK_GRAFT_CODEGEN_CACHE.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "5000"),
        )
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    for key, value in (extra_confs or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
