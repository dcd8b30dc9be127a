"""CDC merge-apply: fold a change feed (upserts + deletes) into a
keyed base snapshot, latest change wins per key.

The reference has no incremental path at all — every refresh rewrites
the consolidated parquet from scratch (``clean_data.py:292-365``). At
100 TB a rebuild is off the table; the standing primitive is MERGE:
given the base table and a (much smaller) ordered change feed, emit
the next snapshot. This is the apply-side complement of
``operators/diff.py::snapshot_diff`` (diff extracts a feed, apply
replays one).

Scale posture: the change feed collapses to one row per key with a
single map-side-combinable hash aggregation (``max_by`` over the
change sequence — no window, so a hot key never funnels its history
through one task's sort). The base then shuffles ONCE on the key for
the left-anti probe (with AQE this becomes a broadcast anti-join
whenever the collapsed feed is small — the common case); surviving
upserts append by union. Output cost ∝ base + changes, never
base × changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Change-feed operation codes.
OP_UPSERT = "upsert"
OP_DELETE = "delete"


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply an ordered change feed to ``base``; returns the new snapshot.

    ``changes`` must carry ``key``, ``seq_col`` (change order — pairs
    ``(key, seq)`` must be unique or latest-wins is ambiguous),
    ``op_col`` ∈ {'upsert', 'delete'}, and every non-key column of
    ``base`` (payload for upserts; ignored for deletes).

    Any other op code (or a null op) FAILS LOUD at execution via
    ``raise_error`` inside the filter — the previous shape silently
    DELETED such keys (removed by the anti-join, then dropped by the
    ``== 'upsert'`` filter), turning a typo'd op into data loss
    (review r15). The guard is a JVM-side expression: no extra pass
    over the feed.
    """
    payload = [c for c in base.columns if c != key]
    latest = changes.groupBy(key).agg(
        F.max_by(
            F.struct(F.col(op_col).alias("_op"), *payload), F.col(seq_col)
        ).alias("_c")
    )
    untouched = base.join(latest.select(key), key, "left_anti")
    op = F.col("_c._op")
    upserts = latest.filter(
        F.when(op == OP_UPSERT, F.lit(True))
        .when(op == OP_DELETE, F.lit(False))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("apply_changes: unknown op code: "),
                    F.coalesce(op, F.lit("NULL")),
                )
            ).cast("boolean")
        )
    ).select(
        key, *[F.col(f"_c.{c}").alias(c) for c in payload]
    )
    return untouched.unionByName(upserts)
