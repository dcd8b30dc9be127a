"""Data-quality and sampling queries (training-data pipeline gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.textstats import normalize_text
from solana_etl_pipeline_spark.operators.drift import psi_report
from solana_etl_pipeline_spark.operators.quality import (
    constraint_report,
    split_by_constraints,
)
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table

_EVENT_CONSTRAINTS = {
    "value_non_negative": "value >= 0",
    "user_id_present": "user_id IS NOT NULL",
    "known_event_type": (
        "event_type IN ('purchase','click','view','signup','error')"
    ),
    "props_parseable_k": (
        "TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL"
    ),
}


def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-constraint violation counts over events, one scan."""
    ev = load_table(spark, sf_dir, "events")
    constraints = {
        "value_non_negative": F.col("value") >= 0,
        "user_id_present": F.col("user_id").isNotNull(),
        "known_event_type": F.col("event_type").isin(
            "purchase", "click", "view", "signup", "error"
        ),
        "props_parseable_k": F.get_json_object("props", "$.k")
        .try_cast("bigint")
        .isNotNull(),
    }
    return constraint_report(ev, constraints)


def data_quality_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clean/violation split summary: row counts per failed-constraint
    signature (empty signature = clean)."""
    ev = load_table(spark, sf_dir, "events")
    constraints = {
        "value_big": F.col("value") >= 50,
        "purchase_only": F.col("event_type") == "purchase",
    }
    clean, violations = split_by_constraints(ev, constraints)
    sig = violations.select(
        F.array_join("failed_constraints", ",").alias("failed")
    ).unionByName(clean.select(F.lit("").alias("failed")))
    return sig.groupBy("failed").agg(F.count(F.lit(1)).alias("n_rows"))


def normalized_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup AFTER canonical text normalization: documents that
    differ only in case/punctuation/whitespace share a group."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", normalize_text(F.col("text")).alias("norm"))
        .groupBy("norm")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling per language (seeded ``sampleBy``) — the
    training-mix knob.

    Seeded sampling is deterministic within Spark but not reproducible
    by another engine, so the sampled count itself can't be
    oracle-matched; instead the query emits, per stratum, the exact
    population plus ``within_band`` — the realized sample proportion
    within ±4 binomial standard deviations (+1/N continuity slack) of
    the requested fraction. The oracle asserts populations and TRUE
    bands: a broken sampler (wrong fraction, wrong stratum routing)
    fails the driver check, while seed-level variation cannot."""
    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "es": 0.25, "de": 0.25, "fr": 0.1, "zh": 0.1}
    sampled_counts = (
        docs.sampleBy("lang", fractions, seed=42)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    population = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_population")
    )
    frac = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )[F.col("lang")]
    p_hat = F.coalesce(F.col("n_sampled"), F.lit(0)) / F.col("n_population")
    tol = 4 * F.sqrt(frac * (1 - frac) / F.col("n_population")) + (
        1 / F.col("n_population")
    )
    return (
        population.join(sampled_counts, "lang", "left")
        .select(
            "lang",
            "n_population",
            (F.abs(p_hat - frac) <= tol).alias("within_band"),
        )
    )


def drift_psi_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (``operators/drift.py``): PSI of the
    ``value`` distribution per event type, reference = first two weeks
    of January vs current = the rest of the month, 10 equal-width bins
    from the reference slice's exact min/max."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    return psi_report(
        ev,
        group_col="event_type",
        value_col="value",
        is_current=F.col("ts")
        >= F.lit("2024-01-15 00:00:00").cast("timestamp"),
        n_bins=10,
    )


# The smoothed-share expression, spelled once and inlined four times in
# the oracle so both engines evaluate byte-identical arithmetic.
_PSI_P = "((CAST(f.ref_count AS DOUBLE) + 0.5) / (CAST(t.n_ref AS DOUBLE) + 5.0))"
_PSI_Q = "((CAST(f.cur_count AS DOUBLE) + 0.5) / (CAST(t.n_cur AS DOUBLE) + 5.0))"


import math

# Benford expectations log10(1 + 1/d), pre-rounded so both engines
# consume the identical 9 constants (no cross-libm log10 in the plan).
_BENFORD_EXP = {
    d: round(math.log10(1.0 + 1.0 / d), 6) for d in range(1, 10)
}


def data_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of ``l_extendedprice`` — the
    classic fabricated-numbers / data-quality screen. The first
    significant digit is taken on the EXACT integer cents
    (``round(price*100)`` → BIGINT → first character of its decimal
    string), never via ``log10`` on doubles, whose libm rounding at
    powers of ten differs across engines.

    Scale posture: one map-side hash aggregation to the 9-digit
    rollup; the share/χ² arithmetic windows over those 9 rows only.
    Expected shares are pre-rounded constants injected into BOTH
    plans, so the χ² contributions derive from identical doubles."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_extendedprice") > 0
    )
    digit = F.substring(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").cast(
            "string"
        ),
        1,
        1,
    ).cast("int")
    counts = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    exp_share = F.element_at(
        F.create_map(
            *[
                x
                for d in range(1, 10)
                for x in (F.lit(d), F.lit(_BENFORD_EXP[d]))
            ]
        ),
        F.col("digit"),
    )
    from pyspark.sql import Window as _W

    total = F.sum("n").over(
        _W.partitionBy().rowsBetween(
            _W.unboundedPreceding, _W.unboundedFollowing
        )
    )
    obs = F.round(F.col("n") / total, 6)
    return counts.select(
        "digit",
        "n",
        obs.alias("obs_share"),
        exp_share.alias("exp_share"),
        F.round(
            (obs - exp_share) * (obs - exp_share) / exp_share, 9
        ).alias("chi_contrib"),
    )


# e0 suffix: DuckDB parses bare float literals as DECIMAL; scientific
# notation forces DOUBLE, matching Spark's literal typing.
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {_BENFORD_EXP[d]}e0" for d in range(1, 10)
) + " END"


# (child table, fk column, parent table, pk column)
_FK_RELATIONS = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
)


def data_ref_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's six FK
    relationships: per relationship, child row count and orphan count
    (child rows whose FK matches no parent key) — the constraint
    check a warehouse runs before trusting a load, which the
    reference's rebuild-everything flow (``clean_data.py:292-365``)
    has no equivalent of.

    Scale posture (r16 one-pass-per-child rewrite, guide §2.4): each
    CHILD table is scanned once — all of its FK relationships resolve
    as left joins against the (distinct) parent key sets in a single
    plan, and ONE aggregate counts total rows plus per-FK orphan rows
    (parent key NULL after the left join ≡ the old left-anti count,
    exactly, because parent keys are primary keys and the join is on
    distinct key sets — no fan-out is possible). The per-relationship
    report rows then explode map-side from the 1-row aggregate. The
    old shape ran TWO aggregates per relationship (12 child scans, 24
    exchanges, 34 jobs measured); this one runs 4 child scans and one
    aggregate each. Dimension parents broadcast; lineitem→orders is
    the one genuinely shuffled join at scale, now paid once instead
    of per-relationship."""
    by_child: dict[str, list[tuple[str, str, str]]] = {}
    for child, fk, parent, pk in _FK_RELATIONS:
        by_child.setdefault(child, []).append((fk, parent, pk))
    reports = []
    for child, rels in by_child.items():
        c = load_table(spark, sf_dir, child)
        joined = c.select(*[F.col(fk) for fk, _, _ in rels])
        for i, (fk, parent, pk) in enumerate(rels):
            p = (
                load_table(spark, sf_dir, parent)
                .select(F.col(pk).alias(f"__pk{i}"))
                .distinct()
            )
            joined = joined.join(
                p, joined[fk] == p[f"__pk{i}"], "left"
            )
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for i in range(len(rels)):
            # coalesce: sum over an EMPTY child is NULL where the old
            # left-anti count() was 0 — keep the 0
            aggs.append(
                F.coalesce(
                    F.sum(F.col(f"__pk{i}").isNull().cast("bigint")),
                    F.lit(0),
                ).alias(f"n_orphans{i}")
            )
        one = joined.agg(*aggs)
        reports.append(
            one.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(
                                    f"{child}.{fk} -> {parent}.{pk}"
                                ).alias("relationship"),
                                F.col("n_rows").alias("n_rows"),
                                F.col(f"n_orphans{i}").alias("n_orphans"),
                                (F.col(f"n_orphans{i}") == 0).alias(
                                    "intact"
                                ),
                            )
                            for i, (fk, parent, pk) in enumerate(rels)
                        ]
                    )
                ).alias("r")
            ).select("r.*")
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


_PROFILE_COLUMNS = (
    # (column, kind): numeric columns report min/max as DOUBLE,
    # temporal as formatted strings, text as raw strings — never a
    # cross-engine double→string render.
    ("event_id", "num"),
    ("user_id", "num"),
    ("value", "num"),
    ("ts", "time"),
    ("event_type", "text"),
    ("props", "text"),
)


def profile_events_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile report over ``events`` (the Deequ/profiling
    shape): per column — row count, null count, exact distinct count,
    and typed min/max (numeric as DOUBLE, temporal as a formatted
    string, text as-is).

    Scale posture (r16 split, guide §2.3): the multi-distinct and the
    plain statistics aggregate in SEPARATE passes combined by a 1-row
    broadcast cross join. Spark plans mixed distinct+plain aggregates
    as ONE Expand of rows × (n_distinct_cols + 1) with every plain-agg
    column duplicated onto each expanded row — measured 2.2-7.2 s at
    sf0.1 vs 1.1-1.5 s split, and at 100 TB the expanded shuffle
    (7× rows carrying all columns) dwarfs the second columnar scan
    the split costs. The distinct pass still uses the standard exact
    Expand (×6, skinny rows); swap in approx_count_distinct when an
    estimate suffices at 100 TB. Per-column report rows unpivot from
    the combined 1-row aggregate map-side."""
    ev = load_table(spark, sf_dir, "events")
    plain = [F.count(F.lit(1)).alias("n_rows")]
    for col, kind in _PROFILE_COLUMNS:
        plain.append(
            F.sum(F.col(col).isNull().cast("bigint")).alias(f"nl_{col}")
        )
        if kind == "num":
            plain.append(
                F.round(F.min(col).cast("double"), 6).alias(f"mn_{col}")
            )
            plain.append(
                F.round(F.max(col).cast("double"), 6).alias(f"mx_{col}")
            )
        elif kind == "time":
            plain.append(
                F.date_format(F.min(col), "yyyy-MM-dd HH:mm:ss").alias(
                    f"mn_{col}"
                )
            )
            plain.append(
                F.date_format(F.max(col), "yyyy-MM-dd HH:mm:ss").alias(
                    f"mx_{col}"
                )
            )
        else:
            plain.append(F.min(col).alias(f"mn_{col}"))
            plain.append(F.max(col).alias(f"mx_{col}"))
    distincts = [
        F.count_distinct(F.col(col)).alias(f"nd_{col}")
        for col, _ in _PROFILE_COLUMNS
    ]
    one = ev.agg(*plain).crossJoin(F.broadcast(ev.agg(*distincts)))
    stack_args = []
    for col, kind in _PROFILE_COLUMNS:
        is_num = kind == "num"
        stack_args.append(
            (
                F.lit(col),
                F.col(f"nl_{col}"),
                F.col(f"nd_{col}"),
                F.col(f"mn_{col}") if is_num else F.lit(None).cast("double"),
                F.col(f"mx_{col}") if is_num else F.lit(None).cast("double"),
                F.lit(None).cast("string")
                if is_num
                else F.col(f"mn_{col}").cast("string"),
                F.lit(None).cast("string")
                if is_num
                else F.col(f"mx_{col}").cast("string"),
            )
        )
    rows = one.select(
        "n_rows",
        F.explode(
            F.array(
                *[
                    F.struct(
                        t[0].alias("column_name"),
                        t[1].alias("n_nulls"),
                        t[2].alias("n_distinct"),
                        t[3].alias("min_num"),
                        t[4].alias("max_num"),
                        t[5].alias("min_text"),
                        t[6].alias("max_text"),
                    )
                    for t in stack_args
                ]
            )
        ).alias("p"),
    )
    return rows.select(
        F.col("p.column_name").alias("column_name"),
        "n_rows",
        F.col("p.n_nulls").alias("n_nulls"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_num").alias("min_num"),
        F.col("p.max_num").alias("max_num"),
        F.col("p.min_text").alias("min_text"),
        F.col("p.max_text").alias("max_text"),
    )


def _profile_oracle_branch(col: str, kind: str) -> str:
    if kind == "num":
        mn = f"round(CAST(min({col}) AS DOUBLE), 6)"
        mx = f"round(CAST(max({col}) AS DOUBLE), 6)"
        mnt = "CAST(NULL AS VARCHAR)"
        mxt = "CAST(NULL AS VARCHAR)"
    elif kind == "time":
        mn = "CAST(NULL AS DOUBLE)"
        mx = "CAST(NULL AS DOUBLE)"
        mnt = f"strftime(min({col}), '%Y-%m-%d %H:%M:%S')"
        mxt = f"strftime(max({col}), '%Y-%m-%d %H:%M:%S')"
    else:
        mn = "CAST(NULL AS DOUBLE)"
        mx = "CAST(NULL AS DOUBLE)"
        mnt = f"min({col})"
        mxt = f"max({col})"
    return f"""
            SELECT '{col}' AS column_name,
                   count(*) AS n_rows,
                   count(*) - count({col}) AS n_nulls,
                   count(DISTINCT {col}) AS n_distinct,
                   {mn} AS min_num, {mx} AS max_num,
                   {mnt} AS min_text, {mxt} AS max_text
            FROM events"""


SKEW_TOP = 10


def data_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew diagnostics for events.user_id: the
    top-10 heaviest keys with their share of all rows and the ratio to
    a perfectly uniform key — the pre-flight report that decides
    whether a join needs salting (operators/skew.py) or AQE skew
    handling before it runs at 100 TB.

    Scale posture: one map-side hash agg to per-key counts; the top-10
    cut compiles to TakeOrderedAndProject; the two corpus scalars
    (total rows, distinct keys) ride a 1-row broadcast combine onto
    the 10 surviving rows. Shares and ratios derive from exact
    BIGINTs."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    totals = per_key.agg(
        F.sum("n").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    top = per_key.orderBy(F.desc("n"), "user_id").limit(SKEW_TOP)
    return top.crossJoin(F.broadcast(totals)).select(
        "user_id",
        "n",
        F.round(F.col("n") / F.col("total_rows"), 6).alias("row_share"),
        F.round(
            F.col("n") * F.col("n_keys") / F.col("total_rows"), 6
        ).alias("x_uniform"),
    )


QUERIES: dict[str, QuerySpec] = {
    "data_skew_report": QuerySpec(
        spark=data_skew_report,
        oracle=f"""
            WITH per_key AS (
              SELECT user_id, count(*) AS n FROM events GROUP BY 1),
            totals AS (
              SELECT CAST(sum(n) AS BIGINT) AS total_rows,
                     count(*) AS n_keys
              FROM per_key),
            top AS (
              SELECT user_id, n FROM per_key
              ORDER BY n DESC, user_id LIMIT {SKEW_TOP})
            SELECT user_id, n,
                   round(n / total_rows, 6) AS row_share,
                   round(n * n_keys / total_rows, 6) AS x_uniform
            FROM top, totals
        """,
        doc="Top-10 heaviest shuffle keys with uniform-key skew ratio",
        tags=("§2.11", "A"),
    ),
    "data_ref_integrity": QuerySpec(
        spark=data_ref_integrity,
        oracle="\n            UNION ALL".join(
            f"""
            SELECT '{child}.{fk} -> {parent}.{pk}' AS relationship,
                   (SELECT count(*) FROM {child}) AS n_rows,
                   (SELECT count(*) FROM {child} c
                     WHERE NOT EXISTS (
                       SELECT 1 FROM {parent} p
                       WHERE p.{pk} = c.{fk})) AS n_orphans,
                   (SELECT count(*) FROM {child} c
                     WHERE NOT EXISTS (
                       SELECT 1 FROM {parent} p
                       WHERE p.{pk} = c.{fk})) = 0 AS intact"""
            for child, fk, parent, pk in _FK_RELATIONS
        ),
        doc="FK orphan audit across the six star-schema relationships",
        tags=("§2.11", "J"),
    ),
    "profile_events_columns": QuerySpec(
        spark=profile_events_columns,
        oracle="\n            UNION ALL".join(
            _profile_oracle_branch(c, k) for c, k in _PROFILE_COLUMNS
        ),
        doc="Deequ-style column profile: nulls/distinct/typed min-max",
        tags=("§2.11", "A"),
    ),
    "data_benford_digits": QuerySpec(
        spark=data_benford_digits,
        oracle=f"""
            WITH c AS (
              SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100)
                                  AS BIGINT) AS VARCHAR), 1, 1) AS INT)
                       AS digit,
                     count(*) AS n
              FROM lineitem WHERE l_extendedprice > 0
              GROUP BY 1),
            s AS (
              SELECT digit, n,
                     round(n / sum(n) OVER (), 6) AS obs_share,
                     {_BENFORD_CASE} AS exp_share
              FROM c)
            SELECT digit, n, obs_share, exp_share,
                   round((obs_share - exp_share)
                         * (obs_share - exp_share) / exp_share, 9)
                     AS chi_contrib
            FROM s
        """,
        doc="Benford first-digit audit on exact integer cents",
        tags=("§2.11", "A"),
    ),
    "drift_psi_report": QuerySpec(
        spark=drift_psi_report,
        oracle=f"""
            WITH tagged AS (
              SELECT event_type AS grp, value AS v,
                     CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15'
                       AS cur
              FROM events
              WHERE value IS NOT NULL AND ts IS NOT NULL),
            stats AS (
              SELECT grp, min(v) AS mn, max(v) AS mx
              FROM tagged WHERE NOT cur GROUP BY 1),
            binned AS (
              SELECT t.grp,
                     CASE WHEN s.mx = s.mn THEN 0
                          ELSE CAST(greatest(0, least(9,
                               floor((t.v - s.mn) * 10 / (s.mx - s.mn))))
                               AS INT)
                     END AS bin_idx,
                     t.cur
              FROM tagged t JOIN stats s ON t.grp = s.grp),
            counts AS (
              SELECT grp, bin_idx,
                     sum(CASE WHEN NOT cur THEN 1 ELSE 0 END)
                       AS ref_count,
                     sum(CASE WHEN cur THEN 1 ELSE 0 END) AS cur_count
              FROM binned GROUP BY 1, 2),
            grid AS (
              SELECT grp, unnest(range(0, 10)) AS bin_idx FROM stats),
            fullg AS (
              SELECT g.grp, CAST(g.bin_idx AS INT) AS bin_idx,
                     CAST(coalesce(c.ref_count, 0) AS BIGINT)
                       AS ref_count,
                     CAST(coalesce(c.cur_count, 0) AS BIGINT)
                       AS cur_count
              FROM grid g LEFT JOIN counts c
                ON g.grp = c.grp AND g.bin_idx = c.bin_idx),
            tot AS (
              SELECT grp, CAST(sum(ref_count) AS BIGINT) AS n_ref,
                     CAST(sum(cur_count) AS BIGINT) AS n_cur
              FROM fullg GROUP BY 1)
            SELECT f.grp AS event_type, f.bin_idx, f.ref_count,
                   f.cur_count,
                   round({_PSI_P}, 6) AS ref_share,
                   round({_PSI_Q}, 6) AS cur_share,
                   round(({_PSI_P} - {_PSI_Q})
                         * ln({_PSI_P} / {_PSI_Q}), 6) AS psi_term
            FROM fullg f JOIN tot t ON f.grp = t.grp
        """,
        doc="PSI distribution-drift monitor per event type, 10 bins",
        tags=("§2.11",),
    ),
    "data_quality_report": QuerySpec(
        spark=data_quality_report,
        oracle=f"""
            WITH counts AS (
              SELECT
                {", ".join(
                    f"sum(CASE WHEN coalesce(({pred}), FALSE) THEN 0 ELSE 1 END) AS {name}"
                    for name, pred in _EVENT_CONSTRAINTS.items()
                )}
              FROM events)
            {" UNION ALL ".join(
                f"SELECT '{name}' AS constraint_name, "
                f"CAST({name} AS BIGINT) AS violations FROM counts"
                for name in _EVENT_CONSTRAINTS
            )}
        """,
        doc="Expectations-style per-constraint violation counts (one scan)",
        tags=("§2.11", "P9"),
    ),
    "data_quality_split": QuerySpec(
        spark=data_quality_split,
        oracle="""
            SELECT concat_ws(',',
                     CASE WHEN value >= 50 THEN NULL ELSE 'value_big' END,
                     CASE WHEN event_type = 'purchase' THEN NULL
                          ELSE 'purchase_only' END) AS failed,
                   count(*) AS n_rows
            FROM events GROUP BY 1
        """,
        doc="Clean/violation row split with failure signatures",
        tags=("§2.11",),
    ),
    "normalized_exact_dedup": QuerySpec(
        spark=normalized_exact_dedup,
        oracle="""
            SELECT min(doc_id) AS keep_id, count(*) AS n_copies
            FROM documents
            GROUP BY trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9_\\s]', '', 'g'), '\\s+', ' ', 'g'))
        """,
        doc="Exact dedup over canonically normalized text",
        tags=("§2.11",),
    ),
    "sample_stratified": QuerySpec(
        spark=sample_stratified,
        oracle="""
            SELECT lang,
                   count(*) AS n_population,
                   TRUE AS within_band
            FROM documents GROUP BY lang
        """,
        doc="Seeded stratified sampling per language, self-banded: "
        "realized proportions within 4 binomial sigma of requested",
        tags=("§2.11",),
    ),
}
