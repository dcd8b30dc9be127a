"""Gaps-and-islands interval coverage.

Merges each key's overlapping (or touching) activity intervals into
maximal "islands" and reports per-key coverage stats — the classic
uptime / active-time primitive the reference's dashboard layer
approximates by eyeballing raw event lists (``streamlit 1.3.txt``
renders per-mint event feeds; total-active-time is the aggregate a
100 TB deployment actually wants).

Scale posture: ONE shuffle on the key; both window passes (the
running ``max(end)`` and the island counter) reuse that partitioning,
and the final per-key rollup is a hash aggregate over island rows
(≤ events per key, usually far fewer). No self-join — the O(n²)
naive interval-overlap join is replaced by the O(n log n) sorted
sweep, which is exactly what a window over (key ORDER BY start)
expresses. All duration arithmetic is exact BIGINT microseconds, so
the oracle comparison needs no float tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_coverage(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    hold_seconds: int,
) -> DataFrame:
    """Per-key merged-interval coverage.

    Each row opens an interval ``[ts, ts + hold_seconds)``; intervals
    that overlap or touch merge into one island. Returns one row per
    key: ``n_islands``, ``covered_sec`` (exact BIGINT seconds of
    merged coverage), and ``n_events``.
    """
    hold_us = int(hold_seconds) * 1_000_000
    base = df.select(
        F.col(key_col).alias("key"),
        F.unix_micros(F.col(ts_col)).alias("start_us"),
        (F.unix_micros(F.col(ts_col)) + F.lit(hold_us)).alias("end_us"),
    ).where(F.col(ts_col).isNotNull())

    w = Window.partitionBy("key").orderBy("start_us", "end_us")
    # Running max of all PRIOR interval ends: a new island starts
    # exactly when this interval begins after everything seen so far.
    prev_end = F.max("end_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.withColumn(
        "new_island",
        F.when(prev_end.isNull() | (F.col("start_us") > prev_end), 1)
        .otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = flagged.groupBy("key", "island").agg(
        F.min("start_us").alias("i_start"),
        F.max("end_us").alias("i_end"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    return (
        islands.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            # Integer floor-division keeps the seconds figure exact
            # BIGINT on both engines (a plain cast would truncate in
            # Spark but round in DuckDB).
            F.floor(
                F.sum(F.col("i_end") - F.col("i_start")) / F.lit(1_000_000)
            ).alias("covered_sec"),
            F.sum("n_ev").alias("n_events"),
        )
    )
