"""Mergeable-sketch rollups — the hypertable/OLAP-cube pattern for
count-distinct at 100 TB.

The reference recomputes ``nunique`` over raw rows on every dashboard
refresh (``streamlit 1.3.txt:96-104``). That is linear in history and
unsustainable at scale: the scalable design rolls raw events up ONCE
into per-day HyperLogLog sketches (a few KB each, Datasketches HLL_4,
lgConfigK=12 → ~1.6% standard error), stores them as binary columns,
and answers any date-range distinct-user question by unioning the
covered sketches — cost proportional to #days, not #events.

Spark-first mechanics: ``hll_sketch_agg`` is a JVM-side declarative
aggregate (partial sketches merge map-side, one shuffle of KB-sized
state per group), and ``hll_union_agg`` re-merges stored sketches.
Merging is associative and lossless, so rollup → union produces the
*identical* estimate to sketching the raw range directly — pinned by
``tests/test_sketches.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_daily_user_sketches(events: DataFrame) -> DataFrame:
    """Roll raw events up to one mergeable HLL sketch per day.

    This is the incremental-maintenance unit: at scale it runs once per
    day partition (or per micro-batch via ``foreachBatch``) and appends
    a single KB-sized row, after which raw events can age out of the
    hot tier.
    """
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("user_sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )


def hll_range_estimate(
    daily: DataFrame,
    start_day: str | None = None,
    end_day: str | None = None,
) -> DataFrame:
    """Distinct-user estimate over a day range, from stored sketches.

    Scans only the rollup table (#days rows), never the raw events.
    Returns one row: ``(distinct_users_est, n_events, n_days)``.
    """
    scoped = daily
    if start_day is not None:
        scoped = scoped.filter(F.col("day") >= F.lit(start_day))
    if end_day is not None:
        scoped = scoped.filter(F.col("day") < F.lit(end_day))
    return scoped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("user_sketch")).alias(
            "distinct_users_est"
        ),
        F.sum("n_events").alias("n_events"),
        F.count(F.lit(1)).alias("n_days"),
    )
