"""Batch ETL pipelines: raw semi-structured documents → silver tables.

Re-expresses the reference's 374-line ``clean_data.py`` transform layer
as declarative DataFrame compositions (SURVEY.md §3.3, §7 Step 5).
"""

from solana_etl_pipeline_spark.pipelines.normalize import (
    dispatch_and_flatten,
    flatten_bare_transactions,
    flatten_wrapped_documents,
    normalize_websocket_messages,
)

__all__ = [
    "dispatch_and_flatten",
    "flatten_bare_transactions",
    "flatten_wrapped_documents",
    "normalize_websocket_messages",
]
