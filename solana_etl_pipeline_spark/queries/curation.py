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
    HOST_RE,
    URL_RE,
    URL_WS_RE,
    extract_domains,
    pack_sequences,
    pii_counts,
    redact_pii,
)
from solana_etl_pipeline_spark.llm.paragraphs import dedup_paragraphs
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


def _para_augmented(docs: DataFrame) -> DataFrame:
    """Give every fixture document three newline-delimited paragraphs
    so line-level dedup has real work on the single-line fixture:

    - para 0: the document text (the fixture's planted exact-dup
      documents make these collide corpus-wide),
    - para 1: a footer — shared boilerplate for ``doc_id % 3 == 0``
      (the RefinedWeb boilerplate case), unique otherwise,
    - para 2: a probe paragraph shared by every 50th id (~10 copies
      per group at sf0.01), so keep-first must pick the smallest
      ``doc_id`` per group.

    Plain ``%`` (not pmod) on both sides: fixture ids are
    non-negative, and Spark's ``%`` and DuckDB's ``%`` agree on the
    dividend's sign anyway."""
    text = F.coalesce(F.col("text"), F.lit(""))
    footer = F.when(
        F.col("doc_id") % 3 == 0, F.lit("shared boilerplate footer")
    ).otherwise(
        F.concat(F.lit("unique footer "), F.col("doc_id").cast("string"))
    )
    probe = F.concat(
        F.lit("probe paragraph group "),
        (F.col("doc_id") % 50).cast("string"),
    )
    return docs.select(
        "doc_id", F.concat_ws("\n", text, footer, probe).alias("text")
    )


def llm_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style exact line dedup over the augmented corpus:
    per-doc paragraph counts plus the reassembled clean text."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_paragraphs(_para_augmented(docs))


def _url_augmented(docs: DataFrame) -> DataFrame:
    """Inject deterministic URLs so the domain rollup has real work on
    the URL-free fixture: every doc links one of 7 content domains;
    every 5th doc additionally carries a tracker link (the
    blocklist-shaped skew the rollup exists to surface)."""
    text = F.coalesce(F.col("text"), F.lit(""))
    return docs.select(
        "doc_id",
        "n_chars",
        F.concat(
            text,
            F.lit(" see https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" https://tracker.example/t/"),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def llm_domain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain link rollup over the augmented corpus: URL and
    document counts plus mean document length — the statistics a
    domain blocklist/quality pass ranks on. One explode + one groupBy
    on the host string; counts are map-side partially aggregated."""
    docs = _url_augmented(load_table(spark, sf_dir, "documents"))
    per_url = docs.select(
        "doc_id",
        "n_chars",
        F.explode(extract_domains(F.col("text"))).alias("domain"),
    )
    return per_url.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
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
                     len(string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f]+', ' ', 'g'), ' '), ' '))
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
    "llm_paragraph_dedup": QuerySpec(
        spark=llm_paragraph_dedup,
        oracle="""
            -- keep-first line dedup. The first-occurrence key is
            -- doc_id*1000000+pos, equivalent to the engine's
            -- lexicographic min(struct(doc_id, pos)) because pos is
            -- bounded far below 1e6 (3 paragraphs per augmented doc).
            WITH aug AS (
              SELECT doc_id,
                     coalesce(text, '') || chr(10) ||
                     CASE WHEN doc_id % 3 = 0
                          THEN 'shared boilerplate footer'
                          ELSE 'unique footer ' ||
                               CAST(doc_id AS VARCHAR) END || chr(10) ||
                     'probe paragraph group ' ||
                     CAST(doc_id % 50 AS VARCHAR) AS text
              FROM documents),
            para AS (
              SELECT doc_id,
                     unnest(ps) AS para,
                     unnest(range(len(ps))) AS pos
              FROM (SELECT doc_id, string_split(text, chr(10)) AS ps
                    FROM aug)),
            firsts AS (
              SELECT sha256(para) AS pk,
                     min(doc_id * 1000000 + pos) AS fk
              FROM para GROUP BY 1),
            verdicts AS (
              SELECT p.doc_id, p.pos, p.para,
                     (p.doc_id * 1000000 + p.pos = f.fk) AS kept
              FROM para p JOIN firsts f ON sha256(p.para) = f.pk)
            SELECT doc_id,
                   count(*) AS n_paras,
                   CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_kept,
                   coalesce(string_agg(para, chr(10) ORDER BY pos)
                              FILTER (WHERE kept), '') AS clean_text
            FROM verdicts GROUP BY doc_id
        """,
        doc="RefinedWeb-style corpus-wide keep-first line dedup",
        tags=("§2.11",),
    ),
    "llm_domain_rollup": QuerySpec(
        spark=llm_domain_rollup,
        oracle=f"""
            WITH aug AS (
              SELECT doc_id, n_chars,
                     coalesce(text, '') || ' see https://site' ||
                     CAST(doc_id % 7 AS VARCHAR) || '.example/p/' ||
                     CAST(doc_id AS VARCHAR) ||
                     CASE WHEN doc_id % 5 = 0
                          THEN ' https://tracker.example/t/' ||
                               CAST(doc_id AS VARCHAR)
                          ELSE '' END AS text
              FROM documents),
            urls AS (
              SELECT doc_id, n_chars,
                     unnest(regexp_extract_all(text, '{URL_WS_RE}'))
                       AS url
              FROM aug),
            hosts AS (
              SELECT doc_id, n_chars,
                     regexp_extract(url, '{HOST_RE}', 1) AS domain
              FROM urls)
            SELECT domain,
                   count(*) AS n_urls,
                   count(DISTINCT doc_id) AS n_docs,
                   round(avg(n_chars), 6) AS avg_chars
            FROM hosts GROUP BY 1
        """,
        doc="Per-domain URL rollup (blocklist/quality curation stats)",
        tags=("§2.11", "F5"),
    ),
}
