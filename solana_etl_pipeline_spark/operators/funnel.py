"""Ordered multi-step conversion funnel over the events stream.

The classic product-analytics operator the reference's dashboard
cannot express (``streamlit 1.3.txt`` stops at per-type counts):
"of the users who did step 1, how many went on to do step 2 AFTER it,
then step 3 after that — all within a time budget of step 1?"

Spark-first shape: one filtered ``min(ts)`` aggregation per step,
chained by an equi-join on the user key — k steps cost k hash
aggregations and k-1 joins that all shuffle on the SAME key (user),
so AQE/exchange reuse co-locates the whole chain after the first
shuffle. No window over the full event stream, no per-user event
collection (a hot user with millions of events costs the same as any
other: min() is a 1-row aggregation state).

Determinism: ``min(ts)`` is dup-insensitive (at-least-once redelivery
safe) and every comparison is strict ``>`` on microsecond timestamps
— identical in Spark and the DuckDB oracle, no truncation involved
(both read the same parquet micros).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ordered_funnel(
    events: DataFrame,
    steps: "tuple[str, ...]" = ("signup", "click", "purchase"),
    within: str = "7 days",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-step funnel completion: ``(step_idx, step, n_users,
    conversion)``.

    A user completes step i+1 iff they have an event of that type
    STRICTLY after their step-i completion time and no later than
    ``step-1 time + within`` (the budget anchors at the funnel entry,
    the standard product-analytics convention). Completion time of a
    step is the EARLIEST qualifying event — greedy, which maximizes
    the remaining budget and is the deterministic choice.

    ``conversion`` is the fraction of step-1 completers still present,
    rounded to 1e-6.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    bound = F.expr(f"INTERVAL {within}")
    u, t = F.col(user_col), F.col(ts_col)

    stage = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(t).alias("t1"))
    )
    counts = [("1:" + steps[0], stage)]
    prev_ts = "t1"
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(u.alias("user"), t.alias("_ts"))
            .join(stage, "user")
            .filter(
                (F.col("_ts") > F.col(prev_ts))
                & (F.col("_ts") <= F.col("t1") + bound)
            )
            .groupBy("user")
            .agg(
                F.min("t1").alias("t1"),
                F.min("_ts").alias(f"t{i}"),
            )
        )
        stage = nxt
        prev_ts = f"t{i}"
        counts.append((f"{i}:{step}", stage))

    out = None
    for idx, (label, frame) in enumerate(counts, start=1):
        row = frame.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(idx).alias("step_idx"),
            F.lit(label.split(":", 1)[1]).alias("step"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    first = out.filter(F.col("step_idx") == 1).select(
        F.col("n_users").alias("_n1")
    )
    return out.crossJoin(F.broadcast(first)).select(
        "step_idx",
        "step",
        "n_users",
        F.round(F.col("n_users") / F.col("_n1"), 6).alias("conversion"),
    )
