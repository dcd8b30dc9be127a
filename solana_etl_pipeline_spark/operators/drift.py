"""Distribution-drift detection: Population Stability Index (PSI)
between a reference and a current slice of a metric, per group.

The reference dashboard recomputes point statistics on every refresh
(``streamlit 1.3.txt:96-104``) but has no notion of "has this metric's
DISTRIBUTION moved since last week" — the standing monitor every
production pipeline (and every training-data refresh) runs before
trusting new data. PSI over equal-width bins is the industry-standard
form: ``Σ (p_i − q_i) · ln(p_i / q_i)`` with smoothed bin shares
(< 0.1 stable, 0.1–0.25 drifting, > 0.25 broken).

Engine-portable determinism: bin edges derive from the REFERENCE
slice's exact min/max (no quantiles — interpolation conventions
differ across engines); the bin index is one arithmetic expression
evaluated identically in Spark and the SQL oracle; shares use
additive (+0.5 per bin) smoothing on exact BIGINT counts, so the only
float surface is the final ln/multiply — orders below the 1e-6
rounding grain.

Scale posture: raw rows are touched twice, both map-side-combinable
hash aggregations (the per-group min/max, then the per-(group, side,
bin) counts); everything downstream — the bin grid, shares, PSI
terms — runs over group × n_bins rows (dimension-scale). The
reference stats broadcast back; no window, no self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    is_current: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Per-(group, bin) PSI decomposition of ``value_col`` drift.

    ``is_current`` is a boolean expression splitting rows into the
    reference slice (False) and the current slice (True). Groups with
    no reference rows are dropped (no edges to bin against). Returns
    the full ``group × n_bins`` grid with exact counts, smoothed
    shares, and the per-bin PSI term (sum terms per group for the
    headline index).
    """
    tagged = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
        is_current.alias("cur"),
    ).filter(F.col("v").isNotNull() & F.col("cur").isNotNull())

    stats = (
        tagged.filter(~F.col("cur"))
        .groupBy("grp")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    )
    binned = tagged.join(F.broadcast(stats), "grp")
    raw = F.floor(
        (F.col("v") - F.col("mn")) * F.lit(n_bins) / (F.col("mx") - F.col("mn"))
    )
    bin_idx = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw))
        )
        .cast("int")
    )
    counts = binned.groupBy("grp", bin_idx.alias("bin_idx")).agg(
        F.sum(F.when(~F.col("cur"), 1).otherwise(0)).alias("ref_count"),
        F.sum(F.when(F.col("cur"), 1).otherwise(0)).alias("cur_count"),
    )
    grid = stats.select(
        "grp",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin_idx"),
    )
    full = grid.join(counts, ["grp", "bin_idx"], "left").select(
        "grp",
        "bin_idx",
        F.coalesce("ref_count", F.lit(0)).alias("ref_count"),
        F.coalesce("cur_count", F.lit(0)).alias("cur_count"),
    )
    totals = full.groupBy("grp").agg(
        F.sum("ref_count").alias("n_ref"), F.sum("cur_count").alias("n_cur")
    )
    smooth = float(0.5 * n_bins)
    j = full.join(F.broadcast(totals), "grp")
    p = (F.col("ref_count").cast("double") + F.lit(0.5)) / (
        F.col("n_ref").cast("double") + F.lit(smooth)
    )
    q = (F.col("cur_count").cast("double") + F.lit(0.5)) / (
        F.col("n_cur").cast("double") + F.lit(smooth)
    )
    return j.select(
        F.col("grp").alias(group_col),
        "bin_idx",
        "ref_count",
        "cur_count",
        F.round(p, 6).alias("ref_share"),
        F.round(q, 6).alias("cur_share"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )
