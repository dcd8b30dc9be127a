"""Operators: reusable DataFrame -> DataFrame compositions."""

from solana_etl_pipeline_spark.operators.risk import risk_scores

__all__ = ["risk_scores"]
