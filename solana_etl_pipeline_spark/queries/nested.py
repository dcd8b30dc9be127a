"""Nested-document queries (SURVEY.md §2.1 S6, §2.2 P2-P4/P11,
§2.8 F13-F17, §2.10 D3, §2.3 J3).

The fixtures are flat parquet, so each query first *constructs* JSON
documents deterministically from fixture rows (``to_json`` — itself
operator F16), then drives the real parse/flatten library
(``pipelines.normalize``) over them. The DuckDB oracle expresses the
net input→output semantics directly against the flat tables, so a
parse/explode/flatten bug cannot hide in the construction step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.pipelines.normalize import dispatch_and_flatten
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table


def _events_as_helius_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render events as raw Helius documents in BOTH reference shapes.

    Even ``user_id`` → metadata-wrapped doc (shape B3); odd → bare
    transaction array (shape B2). Each event becomes one document with
    one transaction carrying one token transfer; the wrapped shape
    leaves the transfer-level mint null so the flatten must fall back
    to ``metadata.mint`` (reference ``clean_data.py:111``).
    """
    ev = load_table(spark, sf_dir, "events")
    transfer = F.struct(
        F.concat(F.lit("F"), F.col("user_id")).alias("fromUserAccount"),
        F.concat(F.lit("A"), F.col("user_id")).alias("toUserAccount"),
        F.round(F.col("value"), 6).alias("tokenAmount"),
        F.when(
            F.col("user_id") % 2 != 0,
            F.concat(F.lit("M"), F.col("user_id")),
        ).alias("mint"),
        F.lit("Fungible").alias("tokenStandard"),
    )
    tx = F.struct(
        F.col("event_type").alias("description"),
        F.upper("event_type").alias("type"),
        F.lit("RAYDIUM").alias("source"),
        F.concat(F.lit("S"), F.col("event_id")).alias("signature"),
        F.col("event_id").alias("slot"),
        F.unix_timestamp("ts").alias("timestamp"),
        F.array(transfer).alias("tokenTransfers"),
    )
    wrapped = F.to_json(
        F.struct(
            F.struct(
                F.concat(F.lit("T"), F.col("user_id")).alias("token_name"),
                F.concat(F.lit("Y"), F.col("user_id")).alias("token_symbol"),
                F.concat(F.lit("M"), F.col("user_id")).alias("mint"),
            ).alias("metadata"),
            F.array(tx).alias("transactions"),
        )
    )
    bare = F.to_json(F.array(tx))
    return ev.select(
        F.when(F.col("user_id") % 2 == 0, wrapped).otherwise(bare).alias("raw")
    )


def nested_helius_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dual-shape dispatch + flatten to the 15-column table,
    checked row-for-row: the oracle reconstructs every column of
    ``CLEANED_TRANSACTIONS`` directly from ``events``."""
    raw = _events_as_helius_json(spark, sf_dir)
    flat = dispatch_and_flatten(raw)
    # ts via unix seconds is exact; cast for a stable compare.
    return flat.select(
        "description",
        "type",
        "source",
        "fee",
        "fee_payer",
        "signature",
        "slot",
        "ts",
        "token_name",
        "token_symbol",
        "from_account",
        "to_account",
        F.round("token_amount", 6).alias("token_amount"),
        "mint",
        "token_standard",
    )


def nested_dispatch_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape-dispatch summary: per source label (wrapped docs flatten
    with source='Helius', bare docs keep their own source), row count,
    distinct mints, and transfer value total."""
    raw = _events_as_helius_json(spark, sf_dir)
    flat = dispatch_and_flatten(raw)
    return flat.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("mint").alias("n_mints"),
        F.round(F.sum("token_amount"), 4).alias("sum_amount"),
    )


def nested_explode_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15/D3: ``explode_outer`` empty-array padding parity
    (``clean_data.py:62-71``): orders become JSON docs whose
    ``transfers`` array holds only high-quantity lineitems — orders
    with none still produce exactly one null-padded row, which the
    oracle models as a LEFT JOIN with no match."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    transfers = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("line"),
                F.col("l_quantity").alias("qty"),
                F.round("l_extendedprice", 4).alias("price"),
            )
        ).alias("transfers")
    )
    docs = (
        orders.join(transfers, orders.o_orderkey == transfers.l_orderkey, "left")
        .select(
            F.to_json(
                F.struct(
                    F.col("o_orderkey").alias("orderkey"),
                    F.col("o_orderpriority").alias("priority"),
                    F.col("transfers"),
                )
            ).alias("raw")
        )
    )
    schema = (
        "struct<orderkey: bigint, priority: string, "
        "transfers: array<struct<line: int, qty: double, price: double>>>"
    )
    parsed = docs.select(F.from_json("raw", schema).alias("doc"))
    exploded = parsed.select(
        F.col("doc")["priority"].alias("priority"),
        F.explode_outer(F.col("doc")["transfers"]).alias("t"),
    )
    return exploded.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.coalesce(F.col("t")["qty"], F.lit(0.0))), 4).alias(
            "sum_qty"
        ),
        F.count(F.col("t")["line"]).alias("n_real_transfers"),
    )


def nested_tojson_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16/F17/F13: struct → to_json → get_json_object round-trip;
    nested path extraction feeds the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.struct(
                F.col("event_type").alias("kind"),
                F.round("value", 6).alias("amount"),
            ).alias("payload"),
        )
    )
    parsed = ev.select(
        F.get_json_object(doc, "$.payload.kind").alias("kind"),
        F.get_json_object(doc, "$.payload.amount").try_cast("double").alias("amount"),
    )
    return parsed.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("amount"), 4).alias("sum_amount"),
    )


def nested_array_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14/F6: array indexing with defaults over split text — first and
    last word per document (``(x or [""])[0]``, ``key.split('/')[-1]``)."""
    docs = load_table(spark, sf_dir, "documents")
    # coalesce: null text indexes as [''] on BOTH sides — without it
    # Spark's size(split(NULL)) is -1 (a bogus word count folded into
    # avg_words) while DuckDB groups the null docs separately
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    return (
        docs.select(
            F.coalesce(F.element_at(words, 1), F.lit("")).alias("first_word"),
            F.coalesce(F.element_at(words, -1), F.lit("")).alias("last_word"),
            F.size(words).alias("n_words"),
        )
        .groupBy("first_word")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_words"), 6).alias("avg_words"),
            F.count_distinct("last_word").alias("n_last_words"),
        )
    )


QUERIES: dict[str, QuerySpec] = {
    "nested_helius_flatten": QuerySpec(
        spark=nested_helius_flatten,
        oracle="""
            SELECT
              event_type AS description,
              upper(event_type) AS type,
              CASE WHEN user_id % 2 = 0 THEN 'Helius' ELSE 'RAYDIUM' END
                AS source,
              0 AS fee,
              '' AS fee_payer,
              'S' || event_id AS signature,
              event_id AS slot,
              CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AS TIMESTAMP)
                AS ts,
              CASE WHEN user_id % 2 = 0 THEN 'T' || user_id ELSE '' END
                AS token_name,
              CASE WHEN user_id % 2 = 0 THEN 'Y' || user_id ELSE '' END
                AS token_symbol,
              'F' || user_id AS from_account,
              'A' || user_id AS to_account,
              round(value, 6) AS token_amount,
              'M' || user_id AS mint,
              'Fungible' AS token_standard
            FROM events
        """,
        doc="Dual-shape parse + flatten, full-row parity (clean_data.py:36-123)",
        tags=("S6", "P2", "P3", "P11", "F13", "F14", "F15", "F17", "J3", "D3"),
    ),
    "nested_dispatch_agg": QuerySpec(
        spark=nested_dispatch_agg,
        oracle="""
            SELECT CASE WHEN user_id % 2 = 0 THEN 'Helius' ELSE 'RAYDIUM' END
                     AS source,
                   count(*) AS n_rows,
                   count(DISTINCT 'M' || user_id) AS n_mints,
                   round(sum(round(value, 6)), 4) AS sum_amount
            FROM events GROUP BY 1
        """,
        doc="Structure-dispatch summary (clean_data.py:84,124-130)",
        tags=("P11", "S6"),
    ),
    "nested_explode_padding": QuerySpec(
        spark=nested_explode_padding,
        oracle="""
            SELECT o.o_orderpriority AS priority,
                   count(*) AS n_rows,
                   round(sum(coalesce(l.l_quantity, 0)), 4) AS sum_qty,
                   count(l.l_linenumber) AS n_real_transfers
            FROM orders o
            LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 45) l
              ON o.o_orderkey = l.l_orderkey
            GROUP BY 1
        """,
        doc="explode_outer empty-array null padding (clean_data.py:62-71)",
        tags=("F15", "D3", "P12"),
    ),
    "nested_tojson_roundtrip": QuerySpec(
        spark=nested_tojson_roundtrip,
        oracle="""
            SELECT event_type AS kind,
                   count(*) AS n_events,
                   round(sum(round(value, 6)), 4) AS sum_amount
            FROM events GROUP BY 1
        """,
        doc="to_json/get_json_object round-trip (F16/F13)",
        tags=("F16", "F17", "F13"),
    ),
    "nested_array_access": QuerySpec(
        spark=nested_array_access,
        oracle="""
            SELECT string_split(coalesce(text, ''), ' ')[1] AS first_word,
                   count(*) AS n_docs,
                   round(avg(len(string_split(coalesce(text, ''), ' '))), 6)
                     AS avg_words,
                   count(DISTINCT string_split(coalesce(text, ''), ' ')[-1])
                     AS n_last_words
            FROM documents GROUP BY 1
        """,
        doc="Array element access w/ defaults (clean_data.py:43)",
        tags=("F14", "F6"),
    ),
}
