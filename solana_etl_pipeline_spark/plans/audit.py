"""Physical-plan audits — make "is this the plan I'd want at 100 TB?"
checkable in code instead of by eyeballing ``.explain()``.

The brief's scale contract (pushdown reached the scan, small dims
broadcast, top-k compiled to TakeOrderedAndProject, no stray
Exchange/CartesianProduct) is asserted by ``tests/test_scale_features``
through this module, and ``plan_report`` summarizes every registered
query's physical operators so a reviewer can diff plan shapes between
rounds without re-running the bench.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The executed physical plan, as Spark prints it."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_explain(df: DataFrame) -> str:
    """``explain("formatted")`` as a string (operators + detail blocks,
    including ``PushedFilters`` / ``ReadSchema`` per scan)."""
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def physical_operators(df: DataFrame) -> list[str]:
    """Physical operator names in plan order (dedup'd detail noise)."""
    ops = []
    for line in formatted_explain(df).splitlines():
        m = re.match(r"^\s*[*()+\-:\d\s]*\s*([A-Za-z][A-Za-z0-9]+)", line)
        if not m:
            continue
        if line.lstrip().startswith(("Output", "Input", "Arguments", "Keys",
                                     "Functions", "Aggregate", "Results",
                                     "Condition", "Join", "Location",
                                     "ReadSchema", "PushedFilters")):
            continue
        ops.append(m.group(1))
        if line.strip() == "":
            break
    return ops


def scan_info(df: DataFrame) -> list[dict[str, str]]:
    """Per-parquet-scan ``PushedFilters`` and ``ReadSchema`` — the two
    lines that decide whether a 100 TB scan reads 100 TB."""
    text = formatted_explain(df)
    scans: list[dict[str, str]] = []
    current: dict[str, str] | None = None
    for line in text.splitlines():
        stripped = line.strip()
        if stripped.startswith("(") and "Scan parquet" in stripped:
            current = {"scan": stripped}
            scans.append(current)
        elif current is not None and stripped.startswith("PushedFilters:"):
            current["pushed_filters"] = stripped.removeprefix("PushedFilters:").strip()
        elif current is not None and stripped.startswith("ReadSchema:"):
            current["read_schema"] = stripped.removeprefix("ReadSchema:").strip()
            current = None
    return scans


def assert_plan(
    df: DataFrame,
    require: tuple[str, ...] = (),
    forbid: tuple[str, ...] = (),
) -> str:
    """Assert substrings (non-)present in the executed plan; returns the
    plan text so callers can chain further checks."""
    plan = executed_plan(df)
    for token in require:
        assert token in plan, f"plan missing {token!r}:\n{plan}"
    for token in forbid:
        assert token not in plan, f"plan contains forbidden {token!r}:\n{plan}"
    return plan


def plan_report(queries, spark, sf_dir: str) -> dict[str, dict]:
    """Summarize every query's physical plan: operator multiset plus
    scan pushdown lines. ``queries`` is ``{name: (spark, sf_dir) -> DataFrame}``."""
    report: dict[str, dict] = {}
    for name, fn in queries.items():
        df = fn(spark, sf_dir)
        plan = executed_plan(df)
        counts: dict[str, int] = {}
        for op in (
            "Exchange", "BroadcastHashJoin", "SortMergeJoin",
            "BroadcastNestedLoopJoin", "CartesianProduct",
            "TakeOrderedAndProject", "HashAggregate", "ObjectHashAggregate",
            "SortAggregate", "WholeStageCodegen", "Window",
            "ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas",
            "MapInPandas",
        ):
            n = plan.count(op)
            if n:
                counts[op] = n
        report[name] = {"operators": counts, "scans": scan_info(df)}
    return report
