"""Batch ETL pipelines: raw semi-structured documents → silver tables.

Re-expresses the reference's 374-line ``clean_data.py`` transform layer
as declarative DataFrame compositions (SURVEY.md §3.3, §7 Step 5).
"""

from solana_etl_pipeline_spark.pipelines.bronze_silver import (
    build_silver,
    read_silver,
    write_silver,
)
from solana_etl_pipeline_spark.pipelines.gold import (
    build_risk_gold,
    refresh_gold,
    top_tokens,
)
from solana_etl_pipeline_spark.pipelines.maintenance import compact_parquet
from solana_etl_pipeline_spark.pipelines.normalize import (
    dispatch_and_flatten,
    flatten_bare_transactions,
    flatten_wrapped_documents,
    normalize_websocket_messages,
)

__all__ = [
    "build_risk_gold",
    "build_silver",
    "compact_parquet",
    "dispatch_and_flatten",
    "flatten_bare_transactions",
    "flatten_wrapped_documents",
    "normalize_websocket_messages",
    "read_silver",
    "refresh_gold",
    "top_tokens",
    "write_silver",
]
