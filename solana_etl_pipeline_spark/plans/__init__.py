"""Physical-plan audit surface (see ``plans.audit``)."""

from solana_etl_pipeline_spark.plans.audit import (
    assert_plan,
    executed_plan,
    formatted_explain,
    plan_report,
    scan_info,
)

__all__ = [
    "assert_plan",
    "executed_plan",
    "formatted_explain",
    "plan_report",
    "scan_info",
]
