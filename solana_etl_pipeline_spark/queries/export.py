"""Training-set assembly queries: the corpus-filter funnel and
deterministic shard layout (SURVEY §2.11; composition of existing
operators — quality score, language ID, exact dedup, portable
multiplicative-hash sharding from ``llm/export.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.export import (
    KNUTH,
    SHARD_P,
    assign_shards,
    assign_splits,
    corpus_filter,
)
from solana_etl_pipeline_spark.llm.textstats import STOPWORDS
from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.sources import load_table
from solana_etl_pipeline_spark.llm import tokenize

N_SHARDS = 8

# Split fractions are 10%/10% in the QUERY (vs the 1%/1% library
# default) so every (source, split) cell is populated at sf0.001.
VAL_FRAC, TEST_FRAC = 0.10, 0.10
# Micro-unit thresholds interpolated into the oracle SQL MUST use the
# same int(round(...)) as assign_splits — int(frac * 1e6) truncates,
# and a fraction whose *1e6 is not float-exact (e.g. 0.29) would give
# the two engines different band edges.
_VAL_M = int(round(VAL_FRAC * 1_000_000))
_TEST_M = int(round(TEST_FRAC * 1_000_000))


def llm_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention funnel per source: predicted-English, quality > 50,
    exact-dedup survivors."""
    docs = load_table(spark, sf_dir, "documents")
    kept = corpus_filter(docs, "doc_id", "text", lang="en", min_quality=50.0)
    kept_stats = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        totals.join(kept_stats, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.round(
                F.coalesce("n_kept", F.lit(0)) / F.col("n_docs"), 4
            ).alias("retention"),
            "avg_quality",
        )
    )


def llm_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard layout: per-shard doc counts, id span, and
    an order-sensitive checksum over the intra-shard read sequence."""
    docs = load_table(spark, sf_dir, "documents")
    sharded = assign_shards(docs, "doc_id", n_shards=N_SHARDS)
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
        F.sum(F.col("doc_id").cast("bigint") * F.col("shard_pos")).alias(
            "order_checksum"
        ),
    )


def llm_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment summarized per
    (source, split): counts and token volume. The per-cell counts ARE
    the disjointness/exhaustiveness proof — they sum to the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    # tokenize.words coalesces: size(split(NULL)) is -1 under ANSI-off,
    # so a null-text doc would subtract from the token sum while the
    # oracle's NULL drops out — both sides count one empty token instead
    words = tokenize.words(F.col("text"))
    return (
        assign_splits(docs, "doc_id", val_frac=VAL_FRAC, test_frac=TEST_FRAC)
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(words)).cast("bigint").alias("n_tokens"),
        )
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# Mirrors of the quality-score and language-ID oracle CTEs used by
# llm_quality_banding / llm_lang_id (queries/llm.py) so this funnel's
# oracle composes the same building blocks it composes in Spark.
_SCORED_SQL = f"""
  feats AS (
    SELECT doc_id, source, text,
           len(string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f]+', ' ', 'g'), ' '), ' ')) AS n_words,
           round(len(list_filter(
               string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f]+', ' ', 'g'), ' '), ' '),
               w -> w IN ({_STOP_SQL}))) * 1.0
             / len(string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f]+', ' ', 'g'), ' '), ' ')), 6) AS stop_ratio,
           round(len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
             / len(text), 6) AS punct_ratio,
           round(len(regexp_extract_all(text, '[0-9]')) * 1.0
             / len(text), 6) AS digit_ratio,
           len(list_filter(string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f]+', ' ', 'g'), ' '), ' '),
               w -> w IN ('the','and','of'))) AS s_en,
           len(list_filter(string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f]+', ' ', 'g'), ' '), ' '),
               w -> w IN ('el','la','de'))) AS s_es,
           len(list_filter(string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f]+', ' ', 'g'), ' '), ' '),
               w -> w IN ('der','die','und'))) AS s_de
    FROM documents),
  scored AS (
    SELECT doc_id, source, text,
           round(greatest(0.0, least(100.0,
             0.4 * least(100.0, n_words * 2.0)
             + 0.3 * (100.0 - abs(stop_ratio - 0.4) * 200.0)
             + 0.3 * (100.0 - (punct_ratio + digit_ratio) * 500.0)
           )), 6) AS quality,
           CASE
             WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de THEN 'en'
             WHEN s_es > 0 AND s_es >= s_de THEN 'es'
             WHEN s_de > 0 THEN 'de'
             ELSE 'und' END AS predicted
    FROM feats)
"""

QUERIES: dict[str, QuerySpec] = {
    "llm_split_assign": QuerySpec(
        spark=llm_split_assign,
        oracle=f"""
            WITH scrambled AS (
              SELECT source,
                     len(string_split(trim(regexp_replace(lower(coalesce(text, '')), '[ \t\n\r\f]+', ' ', 'g'), ' '), ' '))
                       AS doc_tokens,
                     ((doc_id % {SHARD_P}) * {KNUTH % SHARD_P})
                       % {SHARD_P} * 1000000 AS scaled
              FROM documents)
            SELECT source,
                   CASE
                     WHEN scaled < {_VAL_M}::BIGINT
                                   * {SHARD_P} THEN 'val'
                     WHEN scaled < {_VAL_M + _TEST_M}::BIGINT
                                   * {SHARD_P} THEN 'test'
                     ELSE 'train' END AS split,
                   count(*) AS n_docs,
                   CAST(sum(doc_tokens) AS BIGINT) AS n_tokens
            FROM scrambled GROUP BY 1, 2
        """,
        doc="Deterministic train/val/test split (pure-BIGINT hash bands)",
        tags=("§2.11",),
    ),
    "llm_corpus_filter": QuerySpec(
        spark=llm_corpus_filter,
        oracle=f"""
            WITH {_SCORED_SQL},
            gated AS (
              SELECT doc_id, source, text, quality FROM scored
              WHERE predicted = 'en' AND quality > 50.0),
            keepers AS (
              SELECT text, min(doc_id) AS doc_id FROM gated GROUP BY text),
            kept AS (
              SELECT g.* FROM gated g
              JOIN keepers k ON k.text = g.text AND k.doc_id = g.doc_id),
            kept_stats AS (
              SELECT source, count(*) AS n_kept,
                     round(avg(quality), 4) AS avg_quality
              FROM kept GROUP BY source),
            totals AS (
              SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
            SELECT t.source, t.n_docs,
                   coalesce(s.n_kept, 0) AS n_kept,
                   round(coalesce(s.n_kept, 0) * 1.0 / t.n_docs, 4)
                     AS retention,
                   s.avg_quality
            FROM totals t LEFT JOIN kept_stats s ON s.source = t.source
        """,
        doc="Training-corpus funnel: lang gate + quality floor + dedup",
        tags=("§2.11",),
    ),
    "llm_export_shards": QuerySpec(
        spark=llm_export_shards,
        oracle=f"""
            WITH scrambled AS (
              SELECT doc_id,
                     ((doc_id % {SHARD_P}) * {KNUTH % SHARD_P})
                       % {SHARD_P} AS scr
              FROM documents),
            sharded AS (
              SELECT doc_id,
                     scr % {N_SHARDS} AS shard,
                     row_number() OVER (
                       PARTITION BY scr % {N_SHARDS}
                       ORDER BY scr) AS shard_pos
              FROM scrambled)
            SELECT shard, count(*) AS n_docs,
                   min(doc_id) AS min_id, max(doc_id) AS max_id,
                   CAST(sum(doc_id * shard_pos) AS BIGINT) AS order_checksum
            FROM sharded GROUP BY shard
        """,
        doc="Deterministic multiplicative-hash shard layout + checksums",
        tags=("§2.11",),
    ),
}
