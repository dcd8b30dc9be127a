"""Corpus-curation queries: PII redaction audit and sequence packing
(SURVEY §2.11 LLM-data surface; no reference counterpart).

The fixture text is synthetic prose with no PII, so the redaction
query deterministically AUGMENTS each document with one email, one
URL, and one base58 wallet address (derived from sha256 of the text,
``translate``-mapped into the base58 alphabet) — the scrubber then
has real work to do and the oracle can verify counts, the scrubbed
length, and that zero matches survive redaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.curate import (
    ADDR_RE,
    EMAIL_RE,
    URL_RE,
    pack_sequences,
    pii_counts,
    redact_pii,
)
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table

PACK_BUDGET = 512


def _augmented(docs: DataFrame) -> DataFrame:
    """Deterministically inject one email/URL/wallet per document.

    ``coalesce(text, '')`` on BOTH sides (here and ``_AUG_SQL``):
    Spark's ``concat`` is null-in-null-out while DuckDB's skips NULL
    arguments, so a null-text document would otherwise diverge on
    every column (fixture-latent today — no null texts — but the
    symmetric coalesce removes the trap)."""
    text = F.coalesce(F.col("text"), F.lit(""))
    wallet = F.translate(F.substring(F.sha2(text, 256), 1, 36), "0", "g")
    return docs.select(
        "doc_id",
        F.concat(
            text,
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via https://sol.example/tx/"),
            F.col("doc_id").cast("string"),
            F.lit(" wallet "),
            wallet,
        ).alias("text"),
    )


def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction audit: per-doc match counts, scrubbed length, and a
    zero residual-match proof on the redacted text."""
    aug = _augmented(load_table(spark, sf_dir, "documents"))
    counts = pii_counts(F.col("text"))
    redacted = redact_pii(F.col("text"))
    residual = (
        F.regexp_count(redacted, F.lit(EMAIL_RE))
        + F.regexp_count(redacted, F.lit(URL_RE))
        + F.regexp_count(redacted, F.lit(ADDR_RE))
    )
    return aug.select(
        "doc_id",
        *[expr.alias(name) for name, expr in counts.items()],
        F.length(redacted).alias("clean_len"),
        residual.alias("residual"),
    )


def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-fill packing of documents into 512-token packs per
    source stream."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(
        docs, "doc_id", "text", budget=PACK_BUDGET, stream_col="source"
    ).select(
        F.col("stream").alias("source"), "pack_id", "n_docs", "sum_tokens"
    )


_AUG_SQL = """
  aug AS (
    SELECT doc_id,
           concat(coalesce(text, ''), ' contact user',
                  CAST(doc_id AS VARCHAR),
                  '@example.com via https://sol.example/tx/',
                  CAST(doc_id AS VARCHAR), ' wallet ',
                  translate(substr(sha256(coalesce(text, '')), 1, 36),
                            '0', 'g')) AS text
    FROM documents)
"""

QUERIES: dict[str, QuerySpec] = {
    "llm_pii_redact": QuerySpec(
        spark=llm_pii_redact,
        oracle=f"""
            WITH {_AUG_SQL},
            red AS (
              SELECT doc_id, text,
                     regexp_replace(regexp_replace(regexp_replace(text,
                       '{EMAIL_RE}', '<EMAIL>', 'g'),
                       '{URL_RE}', '<URL>', 'g'),
                       '{ADDR_RE}', '<ADDR>', 'g') AS clean
              FROM aug)
            SELECT doc_id,
                   len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
                   len(regexp_extract_all(text, '{URL_RE}')) AS n_urls,
                   len(regexp_extract_all(text, '{ADDR_RE}')) AS n_addrs,
                   len(clean) AS clean_len,
                   len(regexp_extract_all(clean, '{EMAIL_RE}'))
                     + len(regexp_extract_all(clean, '{URL_RE}'))
                     + len(regexp_extract_all(clean, '{ADDR_RE}')) AS residual
            FROM red
        """,
        doc="PII scrub audit: emails/URLs/base58 wallets -> placeholders",
        tags=("§2.11", "F5"),
    ),
    "llm_pack_sequences": QuerySpec(
        spark=llm_pack_sequences,
        oracle=f"""
            WITH toks AS (
              SELECT source, doc_id,
                     len(string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f]+', ' ', 'g')), ' '))
                       AS tokens
              FROM documents),
            packed AS (
              SELECT source, tokens,
                     sum(tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
              FROM toks)
            SELECT source,
                   CAST(floor((cum - tokens) / {PACK_BUDGET}.0) AS BIGINT)
                     AS pack_id,
                   count(*) AS n_docs,
                   CAST(sum(tokens) AS BIGINT) AS sum_tokens
            FROM packed GROUP BY 1, 2
        """,
        doc="Contiguous-fill packing into 512-token context windows",
        tags=("§2.11",),
    ),
}
