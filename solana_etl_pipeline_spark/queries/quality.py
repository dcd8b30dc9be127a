"""Data-quality and sampling queries (training-data pipeline gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.textstats import normalize_text
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


QUERIES: dict[str, QuerySpec] = {
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
