"""File-landing ingestion with checkpointed exactly-once semantics.

Reference → Spark mapping (SURVEY.md §2.9):

- T1 continuous ingestion (``my_websocket.py:62-69`` run_forever) →
  ``readStream`` on the landing directory; the writer that lands files
  is outside the engine (SURVEY §7 Step 6's indirection).
- T2 5-second micro-batch + 999-file cap (``cleandata1.py:11-12``) →
  ``trigger(processingTime='5 seconds')`` + ``maxFilesPerTrigger``.
- T4/T5 processed-ID ledger + idempotent skip (``my_websocket.py:71-87,
  101-105`` — the reference's ledger is even broken, SURVEY §0) →
  ``withWatermark + dropDuplicates`` with a checkpoint; re-running a
  checkpointed query reprocesses nothing.
- T6 delete-after-consume (``cleandata1.py:48``) →
  ``option("cleanSource", ...)``.
- T8 subprocess chaining (``my_websocket.py:140``) → stage B simply
  ``readStream``s stage A's sink directory; one DAG, no processes.

Plus the §2.11 surface the reference lacks: tumbling/sliding/session
windows and an ``applyInPandasWithState`` custom stateful operator.

Scale posture: streaming state (dedup keys, open windows) is bounded by
the watermark horizon; keys are hash-partitioned across executors by
the state store, so throughput scales with the cluster, not the driver.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def landing_stream(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    max_files_per_trigger: int | None = 999,
    clean_source: str | None = None,
    archive_dir: str | None = None,
) -> DataFrame:
    """Unbounded DataFrame over a JSON landing directory (T1/T2/T6).

    ``max_files_per_trigger`` is the reference's BATCH_SIZE admission
    cap; ``clean_source='delete'|'archive'`` is its delete-after-consume
    (kept optional — checkpointing alone already guarantees
    exactly-once, so the default leaves sources in place).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if clean_source:
        reader = reader.option("cleanSource", clean_source)
        if clean_source == "archive" and archive_dir:
            reader = reader.option("sourceArchiveDir", archive_dir)
    return reader.json(landing_dir)


def deduplicated(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """T4: exactly-once by key — the reference's *intended* ledger
    semantics (``my_websocket.py:101-105``). The watermark bounds dedup
    state: keys older than the horizon are evicted, so state is O(keys
    within the watermark), not O(all history).

    The event-time column is APPENDED to the dedup keys: Spark's
    streaming dropDuplicates only evicts state when the watermark
    column is part of the key set — ``dropDuplicates(keys)`` alone
    would keep the watermark for late-row dropping but grow dedup
    state with every key ever seen (the unbounded-ledger failure this
    operator exists to prevent). Redelivered rows carry the same
    event time, so the dedup decision is unchanged; duplicates whose
    event times differ need
    ``withWatermark(ts).dropDuplicatesWithinWatermark(keys)`` (see
    tests/test_streaming.py::test_drop_duplicates_within_watermark).
    """
    key_set = list(keys) if ts_col in keys else [*keys, ts_col]
    return stream.withWatermark(ts_col, watermark).dropDuplicates(key_set)


def deduplicated_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """T4, redelivery-tolerant form: dedup on the BUSINESS keys only,
    state bounded by the watermark horizon.

    :func:`deduplicated` appends the event-time column to the key set
    (the state-eviction requirement of streaming ``dropDuplicates``),
    which silently assumes every redelivery carries the SAME event
    time. That assumption breaks whenever the timestamp is assigned
    downstream of the duplication point — e.g. an ingest-time
    ``current_timestamp()`` stamp is constant within a micro-batch
    but differs across them, so two copies of one message split
    across batches get different keys and BOTH pass (observed as a
    load-dependent exactly-once violation in the pipeline soak test:
    under contention the upstream stage lands a tick's files across
    several commits and the downstream batches split the copies).

    ``dropDuplicatesWithinWatermark`` is built for exactly this: keys
    are only ``keys``, a duplicate is dropped whenever it arrives
    within the watermark horizon of the first copy, and state still
    evicts on the horizon. Use THIS form when event times of
    duplicates can differ; use :func:`deduplicated` when the event
    time is part of the message identity (replayed payloads).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def hourly_window_counts(stream: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Tumbling 1-hour windows — the streaming twin of the batch
    ``events_hourly_rollup`` query (same output schema, same oracle)."""
    return (
        stream.groupBy(F.window(ts_col, "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def sliding_window_counts(
    stream: DataFrame, ts_col: str = "ts", size: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding windows (each event lands in size/slide windows)."""
    return (
        stream.groupBy(F.window(ts_col, size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
        )
    )


def session_window_counts(
    stream: DataFrame, key: str = "user_id", ts_col: str = "ts", gap: str = "30 minutes"
) -> DataFrame:
    """Session windows: activity bursts per key separated by ``gap``."""
    return (
        stream.groupBy(F.col(key), F.session_window(ts_col, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with a time-interval bound: right rows
    within ``[left_ts, left_ts + within]`` of a matching left row.

    Both sides carry watermarks and the join condition bounds
    ``right_ts`` relative to ``left_ts`` from BOTH directions — that
    pair is what lets Structured Streaming evict buffered state: each
    side's buffer holds only rows younger than
    ``watermark + within``, so state is bounded regardless of stream
    length. Without the time bound (or the watermarks) an inner
    stream-stream join must buffer both streams forever.

    ``how='left_outer'`` emits the null-padded row for an unmatched
    left only once the watermark proves no future right row can still
    match (``left_ts + within`` falls behind the watermark) — so
    outer results trail the data by up to ``watermark + within`` of
    event time, and a bounded drain only emits them for left rows
    whose eligibility window has closed. Callers that need
    batch-equivalent output from a finite backlog must advance the
    watermark past the last real row (see the registry query's
    sentinel rows).

    The caller renames columns before joining (both sides usually
    originate from the same schema); ``key`` must exist on the left
    and ``_r_<key>`` on the right, mirroring how the query wrapper
    prepares the frames.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[f"_r_{key}"])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how)


def stateful_running_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value total maintained across micro-batches
    (the general escape hatch when built-in windows can't express the
    state machine)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_running_totals_tws(stream: DataFrame) -> DataFrame:
    """The same per-user running totals on Spark 4's
    ``transformWithStateInPandas`` (the ``StatefulProcessor`` API that
    succeeds ``applyInPandasWithState``): typed named state variables
    (value/list/map, optional TTL), timers, and initial-state
    bootstrap are first-class instead of one state tuple + a timeout
    enum. Semantics pinned equal to :func:`stateful_running_totals`
    by ``tests/test_streaming_rocksdb.py``.

    OSS Spark implements transformWithState ONLY on the RocksDB
    state-store provider — apply
    :func:`~solana_etl_pipeline_spark.session.rocksdb_state_store_confs`
    before starting the query; under the default HDFS-backed provider
    the query fails at start. That makes this the natural API tier
    for 100 TB streaming state: choosing it forces the off-heap
    provider this engine already standardizes on.

    Runtime dependency: the TWS state-server protocol is
    protobuf-based (``pyspark/sql/streaming/proto/StateMessage_pb2``
    requires the protobuf >= 6.33 runtime), so query START needs
    ``google.protobuf`` importable in the driver-side Python worker.
    ENVIRONMENT-BLOCKED in this container (probe 2026-08-16:
    ``google`` absent, pypi DNS-unresolvable; the driver worker exits
    -2 with "cannot import name 'descriptor' from 'google.protobuf'")
    — same class as the delta/PIL seams. Plan construction and the
    output contract are testable without it
    (``tests/test_streaming_rocksdb.py``); the functional parity test
    auto-unskips wherever protobuf exists.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n bigint, total double"
            )

        def handleInputRows(self, key, rows, timer_values):
            prior = self._totals.get() if self._totals.exists() else None
            n, total = prior if prior is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        _RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def _await_drain(query, timeout_sec: int) -> None:
    """awaitTermination(timeout) returns False WITHOUT stopping the
    query when the drain outruns the timeout — callers would then read
    a partially-filled sink while the query keeps running (and a retry
    collides on the live checkpoint). Stop it and fail loudly."""
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise TimeoutError(
            f"availableNow drain exceeded {timeout_sec}s; query stopped "
            f"(partial sink contents discarded by the caller)"
        )


def run_available_now(
    result: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "complete",
    query_name: str | None = None,
    timeout_sec: int = 300,
):
    """Drain everything currently available through a checkpointed
    memory sink and return the materialized rows' table name.

    ``availableNow`` processes the full backlog in rate-limited batches
    then stops — the batch-like harness for streaming tests and the
    driver contract. The memory sink CANNOT recover from an existing
    checkpoint (Spark raises "query does not support recovering from
    checkpoint"), so a re-run with the same ``checkpoint_dir`` errors
    rather than idempotently skipping — use
    ``run_available_now_to_parquet`` for restart/idempotence semantics
    (T5); this helper is for single-shot in-memory assertions only.
    """
    name = query_name or f"q_{uuid.uuid4().hex[:12]}"
    query = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drain(query, timeout_sec)
    return name


def foreach_batch_refresh(
    stream: DataFrame,
    refresh,
    checkpoint_dir: str,
    timeout_sec: int = 300,
):
    """``foreachBatch`` — the sink-to-anything escape hatch: per
    micro-batch, ``refresh(batch_df, batch_id)`` runs arbitrary batch
    logic (merge into a gold table, upsert a store, call a service)
    with exactly-once replay protection from the checkpoint (a retried
    batch re-invokes refresh with the same batch_id — make it
    idempotent on that id)."""
    query = (
        stream.writeStream.foreachBatch(refresh)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drain(query, timeout_sec)


def with_observed_metrics(stream: DataFrame, name: str = "metrics") -> DataFrame:
    """``observe()``: in-flight data-quality counters (rows, null keys,
    value total) collected per micro-batch via QueryProgress — metrics
    without a second pass over the data."""
    return stream.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias(
            "null_keys"
        ),
        F.round(F.sum("value"), 4).alias("value_total"),
    )


def run_available_now_to_parquet(
    result: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 300,
) -> None:
    """Drain to a parquet sink (append mode) with a checkpoint.

    Unlike the memory sink, the file sink is fault-tolerant: restarting
    with the same checkpoint resumes from committed offsets (T5) — the
    harness for idempotence/restart tests and the real bronze→silver
    landing pattern.
    """
    query = (
        result.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drain(query, timeout_sec)
