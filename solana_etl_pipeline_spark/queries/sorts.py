"""Sorts / limits / argmax / per-group firsts (SURVEY.md §2.6, §2.4
A6/A8/A9) — the reference's newest-N / latest-snapshot idioms as
declarative queries.

``orderBy().limit(k)`` compiles to TakeOrderedAndProject (per-partition
heap + driver merge of k rows, never a global sort) — the scale-safe
form of the reference's sort-then-slice (``helius.py:31-32``,
``streamlit 1.3.txt:49,167``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table


def sort_topk_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O5: newest-100 events by timestamp (the reference's
    tail-100k / newest-1000 recency caps, keyed by a column rather
    than file order)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(100)
        .select("event_id", "user_id", "event_type", "value")
    )


def agg_first_latest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+A8: per-user first-seen and latest-seen event attributes via
    min_by/max_by (argmin/argmax) — the reference's ``iloc[0]`` and
    latest-by-LastModified snapshot (``streamlit 1.3.txt:26-39,90-91``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", "event_id").alias("first_event_type"),
        F.max_by("event_type", "event_id").alias("latest_event_type"),
        F.max_by("value", "event_id").alias("latest_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("latest_ts"),
    )


def agg_active_users_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: existence/threshold gate — users with at least 20 events
    (the reference's backlog-size trigger, ``cleandata1.py:70-72``,
    as a HAVING clause)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") >= 20)
    )


def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: DISTINCT set semantics (``df["Mint"].unique()``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_type").distinct()


QUERIES: dict[str, QuerySpec] = {
    "sort_topk_recent": QuerySpec(
        spark=sort_topk_recent,
        oracle="""
            SELECT event_id, user_id, event_type, value
            FROM events
            ORDER BY ts DESC, event_id
            LIMIT 100
        """,
        doc="Newest-N by timestamp (streamlit 1.3.txt:49; helius.py:31-32)",
        tags=("O2", "O5", "O4", "O1"),
    ),
    "agg_first_latest_per_group": QuerySpec(
        spark=agg_first_latest_per_group,
        oracle="""
            SELECT user_id,
                   min_by(event_type, event_id) AS first_event_type,
                   max_by(event_type, event_id) AS latest_event_type,
                   max_by(value, event_id) AS latest_value,
                   CAST(min(ts) AS TIMESTAMP) AS first_ts,
                   CAST(max(ts) AS TIMESTAMP) AS latest_ts
            FROM events GROUP BY user_id
        """,
        doc="argmin/argmax per group (streamlit 1.3.txt:26-39,90-91)",
        tags=("A6", "A8"),
    ),
    "agg_active_users_threshold": QuerySpec(
        spark=agg_active_users_threshold,
        oracle="""
            SELECT user_id, count(*) AS n_events
            FROM events GROUP BY user_id
            HAVING count(*) >= 20
        """,
        doc="Existence-count threshold (cleandata1.py:70-72)",
        tags=("A9", "A4"),
    ),
    "distinct_event_types": QuerySpec(
        spark=distinct_event_types,
        oracle="SELECT DISTINCT event_type FROM events",
        doc="DISTINCT set semantics (helius.py:29,43,49)",
        tags=("A7",),
    ),
}
