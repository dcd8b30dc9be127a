"""Snapshot diff: added / removed / changed rows between two keyed
table versions.

The reference overwrites its consolidated parquet on every rebuild
(``clean_data.py:292-365``) — there is no way to see WHAT a rebuild
changed. A warehouse wants the anti-entropy primitive: given two
snapshots keyed by the same id, classify every divergent key and name
the columns that moved. That powers change auditing, incremental
downstream refresh (process only the diff), and data-quality
regression alerts.

Scale posture: one full-outer equi-join on the key — the canonical
co-partitioned shuffle; column comparison is a null-safe struct
equality (JVM codegen, no per-column job). Unchanged keys are dropped
before the result materializes, so output is proportional to the
CHANGE volume, not the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Classify keys as added / removed / changed between snapshots.

    Returns one row per divergent key: the key columns,
    ``change_type`` ∈ {'added', 'removed', 'changed'}, and
    ``changed_cols`` (comma-joined names of columns whose values
    differ null-safely; empty for added/removed). Keys equal in all
    ``compare_cols`` are omitted.
    """
    o = old.select(
        *keys,
        F.struct(*[F.col(c) for c in compare_cols]).alias("_o"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *keys,
        F.struct(*[F.col(c) for c in compare_cols]).alias("_n"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, keys, "full_outer")

    def _col_diff(c: str) -> Column:
        return F.when(
            ~F.col("_o").getField(c).eqNullSafe(F.col("_n").getField(c)),
            F.lit(c),
        )

    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~F.col("_o").eqNullSafe(F.col("_n")), F.lit("changed"))
    )
    changed_cols = F.when(
        change == "changed",
        F.array_join(
            F.filter(
                F.array(*[_col_diff(c) for c in compare_cols]),
                lambda x: x.isNotNull(),
            ),
            ",",
        ),
    ).otherwise(F.lit(""))
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type", changed_cols.alias("changed_cols"))
    )
