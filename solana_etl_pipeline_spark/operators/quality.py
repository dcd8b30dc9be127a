"""Row-level data-quality gates (expectations-style).

Training-data pipelines gate every ingest on row validity; the engine
form is a single pass that splits rows into (clean, violations) with a
reason column — both lazily evaluated, so one scan serves both sinks.
Constraints are plain Column predicates: JVM-evaluated, pushdown-
friendly, and composable with any source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_report(
    df: DataFrame, constraints: dict[str, Column]
) -> DataFrame:
    """One row per constraint: how many rows violate it (constraint
    holds where the predicate is TRUE; null counts as a violation)."""
    aggs = [
        F.sum(
            F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
        ).alias(name)
        for name, pred in constraints.items()
    ]
    wide = df.agg(*aggs)
    names = list(constraints)
    stacked = ", ".join(f"'{n}', {n}" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {stacked}) as (constraint_name, violations)"
    )


def split_by_constraints(
    df: DataFrame, constraints: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(clean, violations): rows passing ALL constraints vs the rest,
    the latter annotated with the list of failed constraint names."""
    failed = F.filter(
        F.array(
            *[
                F.when(F.coalesce(pred, F.lit(False)), F.lit(None)).otherwise(
                    F.lit(name)
                )
                for name, pred in constraints.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    annotated = df.withColumn("_failed", failed)
    clean = annotated.filter(F.size("_failed") == 0).drop("_failed")
    violations = annotated.filter(F.size("_failed") > 0).withColumnRenamed(
        "_failed", "failed_constraints"
    )
    return clean, violations
