"""Slowly-changing-dimension (type 2) interval builder.

The reference keeps only the LATEST value per token (its pandas
``drop_duplicates`` on mint, ``clean_data.py:318-333``, and the
dashboard's rebuild-on-refresh) — history is discarded. A warehouse
ingesting the same feed at scale wants the opposite: the full validity
history of each entity's state as ``[valid_from, valid_to)`` intervals,
the classic SCD type-2 table build, expressed as a gaps-and-islands
window computation.

Semantics (``state_intervals``): per ``key``, order rows by
``(ts, tie)``; collapse CONSECUTIVE runs of equal ``state`` into one
interval row carrying ``valid_from`` (first ts of the run),
``valid_to`` (first ts of the NEXT run, null for the open current
interval), ``n_events`` (run length) and ``is_current``.

Scale posture: one hash shuffle on ``key`` feeds both windows (Spark
reuses the exchange: the run-id window, the interval lead window and
the run aggregation all partition by ``key``); per-key state is a
single pass — no self-join, no collect. At 100 TB this is the same
cost envelope as any per-user windowed aggregation; skewed keys are
the usual window caveat (cap per-key history upstream if one entity
dominates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def state_intervals(
    df: DataFrame,
    key: str,
    state_col: str,
    ts_col: str = "ts",
    tie_col: str | None = None,
) -> DataFrame:
    """SCD2 build: collapse per-key runs of equal ``state_col`` into
    validity intervals (see module doc for the exact semantics)."""
    order: list[Column] = [F.col(ts_col)]
    if tie_col is not None:
        order.append(F.col(tie_col))
    w = Window.partitionBy(key).orderBy(*order)

    prev_state = F.lag(state_col, 1).over(w)
    changed = F.when(
        prev_state.isNull() | (F.col(state_col) != prev_state), 1
    ).otherwise(0)
    runs = df.withColumn(
        "_run",
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    intervals = runs.groupBy(key, "_run", state_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # Order the interval chain by the run counter, not valid_from: two
    # adjacent runs can share a timestamp (equal ts split by the tie
    # column), and `_run` is the unique total order of runs per key.
    w_iv = Window.partitionBy(key).orderBy("_run")
    return (
        intervals.withColumn(
            "valid_to", F.lead("valid_from", 1).over(w_iv)
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            key,
            F.col(state_col).alias("state"),
            "valid_from",
            "valid_to",
            "n_events",
            "is_current",
        )
    )
