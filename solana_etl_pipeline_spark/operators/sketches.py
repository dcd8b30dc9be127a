"""Mergeable-sketch rollups — the hypertable/OLAP-cube pattern for
count-distinct at 100 TB.

The reference recomputes ``nunique`` over raw rows on every dashboard
refresh (``streamlit 1.3.txt:96-104``). That is linear in history and
unsustainable at scale: the scalable design rolls raw events up ONCE
into per-day HyperLogLog sketches (a few KB each, Datasketches HLL_4,
lgConfigK=12 → ~1.6% standard error), stores them as binary columns,
and answers any date-range distinct-user question by unioning the
covered sketches — cost proportional to #days, not #events.

Spark-first mechanics: ``hll_sketch_agg`` is a JVM-side declarative
aggregate (partial sketches merge map-side, one shuffle of KB-sized
state per group), and ``hll_union_agg`` re-merges stored sketches.
Merging is associative and lossless, so rollup → union produces the
*identical* estimate to sketching the raw range directly — pinned by
``tests/test_sketches.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_daily_user_sketches(events: DataFrame) -> DataFrame:
    """Roll raw events up to one mergeable HLL sketch per day.

    This is the incremental-maintenance unit: at scale it runs once per
    day partition (or per micro-batch via ``foreachBatch``) and appends
    a single KB-sized row, after which raw events can age out of the
    hot tier.
    """
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("user_sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )


def hll_range_estimate(
    daily: DataFrame,
    start_day: str | None = None,
    end_day: str | None = None,
) -> DataFrame:
    """Distinct-user estimate over a day range, from stored sketches.

    Scans only the rollup table (#days rows), never the raw events.
    Returns one row: ``(distinct_users_est, n_events, n_days)``.
    """
    scoped = daily
    if start_day is not None:
        scoped = scoped.filter(F.col("day") >= F.lit(start_day))
    if end_day is not None:
        scoped = scoped.filter(F.col("day") < F.lit(end_day))
    return scoped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("user_sketch")).alias(
            "distinct_users_est"
        ),
        F.sum("n_events").alias("n_events"),
        F.count(F.lit(1)).alias("n_days"),
    )


# ------------------------------------------------ histogram quantiles


def value_histogram_rollup(
    events: DataFrame,
    value_col: str = "value",
    n_bins: int = 64,
    lo: float = 0.0,
    hi: float = 512.0,
) -> DataFrame:
    """Roll raw events up to per-day fixed-bin value histograms — the
    quantile twin of :func:`hll_daily_user_sketches`.

    ``percentile_approx`` over raw rows is linear in history per
    dashboard refresh; the scalable design rolls each day up ONCE into
    ``n_bins`` integer counts (one tiny row group per day), after
    which any date-range quantile question merges bin counts — cost
    ∝ days × bins, never events. Bin counts are exact BIGINTs and
    merging is exact addition, so rollup → merge loses nothing
    (unlike sketch-based quantiles, the only approximation is the
    fixed bin width, chosen up front and engine-portable: no t-digest
    centroids, no implementation-defined compression).

    Values are clamped into ``[lo, hi)``; nulls are dropped. Returns
    ``(day, bin, n)`` with ``bin`` in ``[0, n_bins)``.
    """
    width = (hi - lo) / n_bins
    v = F.col(value_col)
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")
        ),
    )
    return (
        events.filter(v.isNotNull())
        .groupBy(F.to_date("ts").alias("day"), bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def range_quantile_estimates(
    rollup: DataFrame,
    qs: "tuple[float, ...]" = (0.5, 0.9, 0.99),
    start_day: str | None = None,
    end_day: str | None = None,
    n_bins: int = 64,
    lo: float = 0.0,
    hi: float = 512.0,
) -> DataFrame:
    """Quantile estimates over a day range from the histogram rollup.

    Deterministic PURE-INTEGER rank definition, identical in any
    engine: with ``q_micro = round(q * 1e6)``,
    ``rank(q) = greatest(1, ceil_div(q_micro * total, 1e6))`` computed
    with BIGINT arithmetic (``(a + 999999) DIV 1000000``) — a float
    ``ceil(q * total)`` would sit one ulp either side of an exact
    boundary depending on how the engine types the literal (DuckDB
    parses 0.9 as DECIMAL, Spark as DOUBLE). The answer is the
    midpoint of the first bin whose cumulative count reaches the rank
    (``lo + (bin + 0.5) * width`` — two exact float ops, no libm).
    Error vs the true quantile is bounded by the bin width.

    Returns one row per q: ``(q, rank, total, est)``.
    """
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    scoped = rollup
    if start_day is not None:
        scoped = scoped.filter(F.col("day") >= F.lit(start_day))
    if end_day is not None:
        scoped = scoped.filter(F.col("day") < F.lit(end_day))
    merged = scoped.groupBy("bin").agg(F.sum("n").alias("n"))
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the cumsum window runs over ≤ n_bins rows — a bounded single
    # partition over the ROLLUP, never the corpus
    cum = merged.select(
        "bin", "n", F.sum("n").over(w).alias("cum")
    ).crossJoin(
        F.broadcast(
            merged.agg(F.sum("n").cast("bigint").alias("total"))
        )
    )
    out = None
    for q in qs:
        q_micro = int(round(q * 1_000_000))
        rank = F.greatest(
            F.lit(1).cast("bigint"),
            F.expr(f"({q_micro} * total + 999999) DIV 1000000"),
        )
        hit = (
            cum.filter(F.col("cum") >= rank)
            .orderBy("bin")
            .limit(1)
            .select(
                (F.lit(q_micro) / F.lit(1_000_000.0)).alias("q"),
                rank.cast("bigint").alias("rank"),
                F.col("total"),
                F.round(
                    F.lit(lo) + (F.col("bin") + F.lit(0.5)) * F.lit(width), 6
                ).alias("est"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


# ------------------------------------------------- count-min sketch


def _cms_bucket(row_idx: "F.Column", item: "F.Column", width: int):
    """Hash row ``d`` of the CMS: the first 8 hex chars of
    ``md5(d || ':' || item)`` read as an unsigned 32-bit int, mod
    ``width``. md5 is bit-identical in Spark and DuckDB, so the
    sketch an oracle rebuilds in SQL lands every item in the SAME
    cell — the estimate is fully value-checkable, not just
    bound-checkable."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(row_idx.cast("string"), F.lit(":"), item)),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cms_daily_rollup(
    events: DataFrame,
    item_col: str = "user_id",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Roll raw events up to one count-min sketch per day (Cormode &
    Muthukrishnan 2005) — the per-key FREQUENCY twin of the HLL
    (distinct) and histogram (quantile) rollups.

    Each day compresses to at most ``depth × width`` integer cells
    regardless of item cardinality; merging days is exact cell-wise
    addition, so any date-range point-frequency question reads the
    rollup, never raw events. Estimates are biased UP only:
    ``exact <= est <= exact + collisions`` — the classic guarantee,
    with overshoot shrinking as ``width`` grows.

    Spark shape: the depth-way explode fans each event into ``depth``
    (row, bucket) cells and the groupBy partially aggregates map-side,
    so the shuffle carries day × depth × width cells, not events.
    Returns ``(day, row_idx, bucket, cnt)``; null items are dropped
    (count them separately if they matter).
    """
    item = F.col(item_col).cast("string")
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias(
        "row_idx"
    )
    return (
        events.filter(F.col(item_col).isNotNull())
        .select(F.to_date("ts").alias("day"), item.alias("item"))
        .select("day", "item", rows)
        .groupBy(
            "day",
            "row_idx",
            _cms_bucket(F.col("row_idx"), F.col("item"), width).alias(
                "bucket"
            ),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_range_estimates(
    rollup: DataFrame,
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 256,
    start_day: str | None = None,
    end_day: str | None = None,
) -> DataFrame:
    """Point-frequency estimates over a day range from the CMS rollup:
    merge the covered days cell-wise, probe each item's ``depth``
    cells, take the min. ``items`` is the (small or large — it joins
    on (row, bucket), no broadcast needed) set of keys to estimate.
    Returns ``(item, cms_estimate)``.
    """
    scoped = rollup
    if start_day is not None:
        scoped = scoped.filter(F.col("day") >= F.lit(start_day))
    if end_day is not None:
        scoped = scoped.filter(F.col("day") < F.lit(end_day))
    merged = scoped.groupBy("row_idx", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    probes = items.select(
        F.col(item_col).cast("string").alias("item")
    ).select(
        "item",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row_idx"),
    ).withColumn(
        "bucket", _cms_bucket(F.col("row_idx"), F.col("item"), width)
    )
    return (
        probes.join(merged, ["row_idx", "bucket"], "left")
        .groupBy("item")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_estimate")
        )
    )
