"""Sources: fixture-table loaders and raw-document readers."""

from solana_etl_pipeline_spark.sources.tables import load_table, load_tables

__all__ = ["load_table", "load_tables"]
