"""Bronze → silver batch pipeline (SURVEY.md §3.3, §7 Step 5).

The reference's ``clean_data.py`` main (374 lines): list raw JSON →
per-file dict walking → pandas concat → CSV archive hop → rename dance →
incremental Parquet with manual harmonize. Here the same data flow is
one declarative job:

    raw Helius JSON (both shapes)  ─┐
                                    ├─ normalize → unionByName
    websocket landing JSON         ─┘
      → dropDuplicates(mint, signature)      (the intended ledger)
      → parquet partitioned by event date    (the one true table)

No intermediate materialization (X12), no renames (S14 — ordering is a
*column*), no delete-commits (S13). At 100 TB the date partitioning
gives per-day pruning and the dedup is a hash shuffle on (mint,
signature) — the only wide stage in the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.pipelines.normalize import (
    dispatch_and_flatten,
    normalize_websocket_messages,
)
from solana_etl_pipeline_spark.schemas import CLEANED_TRANSACTIONS
from solana_etl_pipeline_spark.sources.sinks import (
    read_parquet_merged,
    write_parquet,
)
from pyspark.sql.types import StringType, StructField, StructType

#: Raw landing rows are one JSON document per line under a single
#: ``raw`` column (the file *is* the message, SURVEY §1.4).
RAW_SCHEMA = StructType([StructField("raw", StringType())])


def build_silver(
    helius_raw: DataFrame,
    websocket_raw: DataFrame,
    dedup_keys: tuple[str, str] = ("mint", "signature"),
) -> DataFrame:
    """Normalize both raw feeds, merge, and deduplicate."""
    helius = dispatch_and_flatten(helius_raw)
    ws = normalize_websocket_messages(websocket_raw)
    merged = helius.unionByName(ws)
    return merged.dropDuplicates(list(dedup_keys))


def write_silver(
    silver: DataFrame,
    path: str,
    mode: str = "append",
    dedup_against_existing: bool = False,
    spark: "SparkSession | None" = None,
    dedup_keys: tuple[str, str] = ("mint", "signature"),
) -> None:
    """Materialize the silver table partitioned by event date (null
    dates — websocket rows carry no timestamp — land in the Hive
    default partition and stay queryable).

    ``build_silver`` dedups only WITHIN its batch, so plain appends
    re-introduce ``(mint, signature)`` duplicates when a later run
    replays a message or an export re-fetches a transaction (review
    r15). ``dedup_against_existing=True`` closes the cross-run hole
    with a left-anti join against the keys already in ``path``
    (needs ``spark``; a missing/empty table is treated as no keys).
    The probe reads ONLY the key columns (column-pruned scan) and is
    the batch twin of the streaming path's watermarked dedup state —
    use the streaming path when the feed is continuous; this flag
    when batch appends can overlap. Off by default: pure-append
    callers (non-overlapping exports) shouldn't pay a key scan.
    """
    if dedup_against_existing:
        if spark is None:
            raise ValueError(
                "dedup_against_existing=True requires the spark session"
            )
        keys = list(dedup_keys)
        try:
            existing = read_silver(spark, path).select(*keys)
        except Exception:
            existing = None  # first write: nothing to dedup against
        if existing is not None:
            silver = silver.join(existing, keys, "left_anti")
    write_parquet(
        silver.withColumn("event_date", F.to_date("ts")),
        path,
        partition_cols=["event_date"],
        mode=mode,
    )


def read_silver(spark: SparkSession, path: str) -> DataFrame:
    """Read the silver table (merged schema, partition pruning on
    ``event_date`` predicates)."""
    return read_parquet_merged(spark, path)


def silver_schema_columns() -> list[str]:
    """The canonical column set (contract check for tests)."""
    return [f.name for f in CLEANED_TRANSACTIONS.fields]
