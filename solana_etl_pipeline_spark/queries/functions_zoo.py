"""Scalar-function coverage queries (SURVEY.md §2.8 F1, F5-F8) plus the
Pandas-UDF enrichment surface (§2.10 D2/D4) with oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.functions.strings import (
    basename,
    is_timestamp_prefixed,
    label_with_key,
    swap_suffix,
)
from solana_etl_pipeline_spark.functions.timestamps import epoch_to_zoned_string
from solana_etl_pipeline_spark.operators.enrich import (
    map_in_pandas_enrich,
    risk_scores_grouped_map,
)
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table


def string_functions_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5-F8 in one pass: build an object key per document, then swap
    its extension, take its basename, label it, and prefix-digit-test
    it — the reference's filename algebra as column expressions."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.concat(
        F.lit("data/"), F.col("source"), F.lit("/"), F.col("doc_id"), F.lit(".json")
    )
    return docs.select(
        "doc_id",
        swap_suffix(basename(key), ".json", ".csv").alias("csv_name"),
        label_with_key(F.col("lang"), F.col("source")).alias("label"),
        is_timestamp_prefixed(F.substring(F.col("text"), 1, 14)).alias(
            "text_ts_prefixed"
        ),
        is_timestamp_prefixed(F.lpad(F.col("doc_id"), 14, "0")).alias(
            "padded_ts_prefixed"
        ),
    )


def epoch_rendering_pst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 exact form: epoch seconds → America/Los_Angeles wall-clock
    string, per event (the reference's ``convert_to_pst``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        epoch_to_zoned_string(F.unix_timestamp("ts")).alias("pst_str"),
    )


def enrich_risk_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: the flagship risk metrics via grouped-map applyInPandas —
    same semantics as the native aggregate (same oracle, no top-k)."""
    from solana_etl_pipeline_spark.functions.jsonf import json_str
    from solana_etl_pipeline_spark.queries.reference import EXCLUDED_USER_IDS

    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("holder", json_str(F.col("props"), "$.k"))
        .filter(~F.col("user_id").isin(EXCLUDED_USER_IDS))
    )
    return risk_scores_grouped_map(ev)


def enrich_http_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: Arrow-batched external-lookup enrichment (mapInPandas). The
    injected fetcher is deterministic (a pure function of the key) so
    the oracle can replay it; a real deployment swaps in an async HTTP
    client with the same signature."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")

    def fake_token_name_service(keys: list) -> dict:
        # stands in for asyncio.gather over HTTP (streamlit 1.3.txt:56-81)
        return {k: f"name_{k % 7}" for k in keys}

    enriched = map_in_pandas_enrich(
        ev, fake_token_name_service, key_col="user_id", out_col="token_name"
    )
    return enriched.groupBy("token_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


QUERIES: dict[str, QuerySpec] = {
    "string_functions_zoo": QuerySpec(
        spark=string_functions_zoo,
        oracle="""
            SELECT doc_id,
                   regexp_replace(
                     string_split('data/' || source || '/' || doc_id
                                  || '.json', '/')[-1],
                     '\\.json$', '.csv') AS csv_name,
                   lang || ' | ' || source AS label,
                   regexp_matches(substr(text, 1, 14), '^[0-9]{14}$')
                     AS text_ts_prefixed,
                   regexp_matches(lpad(CAST(doc_id AS VARCHAR), 14, '0'),
                                  '^[0-9]{14}$') AS padded_ts_prefixed
            FROM documents
        """,
        doc="Filename/string algebra: suffix swap, basename, label, "
        "prefix-digit test (F5-F8)",
        tags=("F5", "F6", "F7", "F8"),
    ),
    "epoch_rendering_pst": QuerySpec(
        spark=epoch_rendering_pst,
        oracle="""
            SELECT event_id,
                   strftime(
                     (to_timestamp(CAST(floor(epoch(ts)) AS BIGINT))
                       AT TIME ZONE 'America/Los_Angeles'),
                     '%Y-%m-%d %H:%M:%S') AS pst_str
            FROM events
        """,
        doc="Epoch → zoned display string, per event (clean_data.py:27-34)",
        tags=("F1", "F3"),
    ),
    "enrich_risk_grouped_map": QuerySpec(
        spark=enrich_risk_grouped_map,
        oracle="""
            WITH agg AS (
              SELECT user_id,
                     count(DISTINCT json_extract_string(props, '$.k'))
                       AS unique_holders,
                     count(DISTINCT CASE WHEN event_type = 'purchase'
                       THEN json_extract_string(props, '$.k') END)
                       AS unique_buyers,
                     count(*) AS total_events
              FROM events WHERE user_id NOT IN (0, 1) GROUP BY user_id
            ), scored AS (
              SELECT *,
                CASE WHEN unique_holders > 0
                     THEN 100.0 / (1.0 + unique_holders) ELSE 100.0 END
                  AS ownership_risk,
                CASE WHEN unique_buyers > 0
                     THEN 100.0 / (1.0 + unique_buyers) ELSE 100.0 END
                  AS liquidity_risk,
                total_events / (1.0 + unique_holders) AS txn_concentration
              FROM agg
            ), weighted AS (
              SELECT *, 0.4 * ownership_risk + 0.4 * liquidity_risk
                        + 0.2 * txn_concentration AS jeet_risk_score
              FROM scored)
            SELECT user_id, unique_holders, unique_buyers, total_events,
                   round(ownership_risk, 6) AS ownership_risk,
                   round(liquidity_risk, 6) AS liquidity_risk,
                   round(txn_concentration, 6) AS txn_concentration,
                   round(jeet_risk_score, 6) AS jeet_risk_score,
                   round(greatest(0.0, 100.0 - jeet_risk_score), 6)
                     AS safety_score
            FROM weighted
        """,
        doc="Grouped-map applyInPandas risk twin (streamlit 1.3.txt:83-113)",
        tags=("D2",),
    ),
    "enrich_http_lookup": QuerySpec(
        spark=enrich_http_lookup,
        oracle="""
            SELECT 'name_' || (user_id % 7) AS token_name,
                   count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1
        """,
        doc="Arrow-batched external-lookup enrichment (D4, mocked fetcher)",
        tags=("D4", "D1", "S3"),
    ),
}
