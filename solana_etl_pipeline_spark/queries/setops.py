"""Set operations + schema harmonization (SURVEY.md §2.7 U1-U3, §2.11).

U2 is the reference's Arrow-side schema harmonization
(``clean_data.py:344-349``): later files may be missing columns, which
get null-filled and reordered to the target schema. In Spark that whole
60-line dance is ``unionByName(allowMissingColumns=True)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table


def setop_union_harmonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U2: union two differently-shaped projections; the second is
    missing ``value`` (null-filled) and has an extra ``source_tag`` the
    first lacks (null-filled on that side)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.round("value", 6).alias("value")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.lit("err_feed").alias("source_tag")
    )
    return purchases.unionByName(errors, allowMissingColumns=True)


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users who both purchased and hit an error (INTERSECT)."""
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    erroring = ev.filter(F.col("event_type") == "error").select("user_id")
    return buyers.intersect(erroring)


def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference: per-user event multiplicity surviving
    EXCEPT ALL of the error feed from the full feed."""
    ev = load_table(spark, sf_dir, "events")
    all_ids = ev.select("user_id")
    error_ids = ev.filter(F.col("event_type") == "error").select("user_id")
    return (
        all_ids.exceptAll(error_ids)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


QUERIES: dict[str, QuerySpec] = {
    "setop_union_harmonize": QuerySpec(
        spark=setop_union_harmonize,
        oracle="""
            SELECT event_id, user_id, round(value, 6) AS value,
                   NULL AS source_tag
            FROM events WHERE event_type = 'purchase'
            UNION ALL
            SELECT event_id, user_id, NULL AS value, 'err_feed' AS source_tag
            FROM events WHERE event_type = 'error'
        """,
        doc="unionByName w/ missing-column null-fill (clean_data.py:344-349)",
        tags=("U1", "U2", "P4"),
    ),
    "setop_intersect": QuerySpec(
        spark=setop_intersect,
        oracle="""
            SELECT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'error'
        """,
        doc="INTERSECT distinct membership",
        tags=("§2.11",),
    ),
    "setop_except_all": QuerySpec(
        spark=setop_except_all,
        oracle="""
            WITH survivors AS (
              SELECT user_id FROM events
              EXCEPT ALL
              SELECT user_id FROM events WHERE event_type = 'error')
            SELECT user_id, count(*) AS n_rows
            FROM survivors GROUP BY user_id
        """,
        doc="EXCEPT ALL multiset difference",
        tags=("U3", "§2.11"),
    ),
}
