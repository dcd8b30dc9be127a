"""As-of (nearest-prior) join — an operator Spark lacks natively
(SURVEY.md §2.3 gap row; §2.11 range/as-of joins).

Semantics: for every left row, attach the latest right row with the
same key whose timestamp is ≤ the left row's timestamp.

Implementation is the union-scan trick, NOT a range join:

1. tag both sides and union them on (key, ts);
2. one window pass per key ordered by (ts, side-tag) computes
   ``last(right-value, ignorenulls)`` up to the current row;
3. keep the left rows — each now carries the most recent right value.

Cost: one hash shuffle on the key + one per-key sort — the same price
as a groupBy, independent of time-range density. A naive
``l.ts >= r.ts`` theta join explodes to O(|L|·|R|) pairs per key and
dies at scale; this form is how you do as-of at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join on ``key`` by ``ts``; appends each ``value_cols``
    from the nearest right row at-or-before the left timestamp (null
    when no prior right row exists)."""
    left_cols = left.columns
    tagged_left = left.withColumn("_side", F.lit(1))
    for c in value_cols:
        tagged_left = tagged_left.withColumn(f"_r_{c}", F.lit(None))
    tagged_right = right.select(
        key,
        ts,
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    # null-pad the left-only columns on the right side
    for c in left_cols:
        if c not in (key, ts):
            tagged_right = tagged_right.withColumn(c, F.lit(None))

    merged = tagged_left.select(
        *left_cols, "_side", *[f"_r_{c}" for c in value_cols]
    ).unionByName(
        tagged_right.select(
            *left_cols, "_side", *[f"_r_{c}" for c in value_cols]
        )
    )

    # right rows (_side=0) sort before left rows at equal ts, so a
    # same-timestamp right row IS visible to the left row (ties = "at")
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        merged = merged.withColumn(
            f"{c}{suffix}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    return merged.filter(F.col("_side") == 1).select(
        *left_cols, *[f"{c}{suffix}" for c in value_cols]
    )
