"""Training-set assembly: corpus filtering funnel and shard export.

The last mile of an LLM data pipeline (SURVEY §2.11 surface; no
reference counterpart): take a curated corpus, keep only
training-worthy documents, and lay them out as deterministic shards a
trainer can stream.

- **Corpus filter**: language gate (predicted, not labeled — labels
  lie at scale) + quality floor + exact-dedup survivor selection, all
  composed from the existing operators. One aggregation per stage;
  the dedup semi-join shuffles on the content key only.
- **Shard assignment**: ``shard = (doc_id * KNUTH) mod n_shards`` — a
  multiplicative-hash pseudo-shuffle that is deterministic, uniform
  for sequential ids, engine-portable (plain BIGINT arithmetic, so
  the DuckDB oracle can replay it exactly — unlike xxhash64), and
  stateless: any worker can recompute any document's shard. Within a
  shard, documents are ordered by the same product for an
  order-decorrelated read sequence.
- **Shard writer**: one parquet directory partitioned by ``shard`` —
  at scale each shard is written by the tasks that own its partition
  after a single hash shuffle, and trainers read ``shard=K/``
  directories independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.llm.textstats import language_id, quality_score

# Knuth's multiplicative constant (2^32 / phi), coprime with any
# power-of-two shard count; products of 2^31-scale ids stay far under
# the 2^63 BIGINT ceiling, so Spark ANSI mode and DuckDB agree.
KNUTH = 2654435761


def corpus_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 50.0,
) -> DataFrame:
    """Training-worthiness gate: predicted language, quality floor,
    and exact-dedup survivors (min id per distinct text).

    Returns the surviving rows with a ``quality`` column attached —
    the score rides along so downstream stages never re-evaluate the
    (wide) text-stats expression tree. The dedup semi-join keys on
    ``sha2(text)`` rather than the text itself: shuffle rows carry a
    32-byte digest instead of whole documents (same design as
    ``exact_dedup_groups``; identical result up to sha256 collisions).
    """
    text = F.col(text_col)
    gated = (
        df.withColumn("quality", quality_score(text))
        .withColumn("_lang", language_id(text))
        .filter((F.col("_lang") == lang) & (F.col("quality") > min_quality))
        .drop("_lang")
        .withColumn("_key", F.sha2(text, 256))
    )
    keepers = gated.groupBy("_key").agg(F.min(id_col).alias(id_col))
    return gated.join(keepers, ["_key", id_col], "left_semi").drop("_key")


def shard_key(id_col: Column, n_shards: int) -> Column:
    """Deterministic, engine-portable shard assignment."""
    return F.pmod(id_col.cast("bigint") * F.lit(KNUTH), F.lit(n_shards))


def assign_shards(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = 8
) -> DataFrame:
    """Add ``shard`` and an intra-shard ``shard_pos`` read order."""
    sharded = df.withColumn("shard", shard_key(F.col(id_col), n_shards))
    order = F.col(id_col).cast("bigint") * F.lit(KNUTH)
    w = Window.partitionBy("shard").orderBy(order)
    return sharded.withColumn("shard_pos", F.row_number().over(w))


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> None:
    """Materialize shards as ``shard=K`` parquet partitions, rows laid
    down in ``shard_pos`` order within each file."""
    out = assign_shards(df, id_col, n_shards)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
