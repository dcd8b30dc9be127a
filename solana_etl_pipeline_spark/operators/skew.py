"""Skew mitigation: salted aggregation and salted joins (SURVEY.md §4;
the 100 TB brief's "skewed keys hurt" clause).

AQE's skew-join splitting (on by default, ``session.RUNTIME_CONFS``)
handles most skew at runtime; explicit salting is the deterministic
fallback when one key dominates so hard that even split partitions
bottleneck (a viral mint, a null-heavy join key):

- **Salted aggregation**: two-stage — partial aggregate on
  (key, salt) spreads one hot key over N partitions, then a final
  aggregate on key merges the partials. Works for any algebraic
  aggregate (sum/count/min/max); the general decomposition the engine's
  partial+final hash aggregate already does per-partition, made
  explicit across the shuffle.
- **Salted join**: fact side gets a random-but-deterministic salt in
  [0, N); the (small) build side is replicated N× with every salt value
  so each fact partition still finds its match. Trades N× build-side
  duplication for an N-way split of the hot key's partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def _salt(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt in [0, buckets): xxhash64 over every
    row column. Stable across stage retries and shuffle recomputes (the
    SPARK-23207 hazard that rules out rand()/monotonically_increasing_id
    — a salt that changes between task attempts can lose or duplicate
    rows). Fully-identical duplicate rows share a salt, which only
    costs spread when a hot key's rows are byte-identical; aggregation
    stays correct either way.

    Columns containing MapType anywhere in their type (including
    nested in structs/arrays) are skipped: xxhash64 rejects maps at
    analysis time (map equality/ordering is undefined). As long as one
    hashable column varies within the hot key, the salt still spreads
    it."""

    def _has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    hashable = [
        F.col(f.name) for f in df.schema.fields if not _has_map(f.dataType)
    ]
    if not hashable:
        raise ValueError("salting needs at least one non-map column to hash")
    return F.pmod(F.xxhash64(*hashable), buckets)


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Example::

        salted_aggregate(ev, "user_id",
                         {"n": ("value", "count"), "total": ("value", "sum")})
    """
    partial_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for _, (_, fn) in aggs.items():
        if fn not in partial_fns:
            raise ValueError(f"unsupported aggregate: {fn}")

    salted = df.withColumn("_salt", _salt(df, buckets))
    partial = salted.groupBy(key, "_salt").agg(
        *[
            partial_fns[fn](F.col(src)).alias(f"_p_{out}")
            for out, (src, fn) in aggs.items()
        ]
    )
    return partial.groupBy(key).agg(
        *[
            merge_fns[fn](F.col(f"_p_{out}")).alias(out)
            for out, (src, fn) in aggs.items()
        ]
    )


def salted_join(
    facts: DataFrame,
    build: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the build
    side across all salt values, join on (key, salt). The build side
    must be the small one — it grows ``buckets``×.

    Only fact-preserving join types are legal: a build row that
    matches nothing exists ``buckets`` times after replication, so a
    right/full outer join would emit ``buckets`` null-padded copies
    of it — silently wrong results, hence the guard.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "cross",
               "semi", "leftsemi", "left_semi", "anti", "leftanti",
               "left_anti"}
    if how.lower().replace("_", "") not in {
        a.replace("_", "") for a in allowed
    }:
        raise ValueError(
            f"salted_join supports fact-preserving joins only "
            f"(inner/left/semi/anti), not {how!r}: replicated build "
            f"rows would duplicate unmatched right-side output"
        )
    salted_facts = facts.withColumn("_salt", _salt(facts, buckets))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(buckets - 1))
    ).alias("_salt")
    replicated = build.select("*", salts)
    out = salted_facts.join(replicated, [key, "_salt"], how)
    return out.drop("_salt")
