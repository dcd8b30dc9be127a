"""Interleaved A/B of the r15 vs r16 NB-classifier forms (r17 —
VERDICT r16 item 4: the committed r16 bench showed the query UP;
decide by a clean interleaved measurement at the driver's core count).

Forms:
  old  r15: fit and score each run their own tokenize+explode pass;
       argmax via row_number window over (doc) ordered by
       (desc rounded score, asc label)
  new  r16 (current code): one persisted shared_tokens frame feeds fit
       and score; argmax as min(struct(-score, label, ...)) hash
       aggregate

Run: SPARK_GRAFT_CPUS=32 python tools/nb_ab.py <sf_dir> [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from solana_etl_pipeline_spark.llm import classify as C  # noqa: E402
from solana_etl_pipeline_spark.queries import QUERIES  # noqa: E402
from solana_etl_pipeline_spark.session import build_session  # noqa: E402
from solana_etl_pipeline_spark.sources import load_table  # noqa: E402


def nb_score_old(target, model, label_stats, id_col="doc_id",
                 text_col="text"):
    """The r15 scoring shape: own token pass + row_number window."""
    model = model.persist()
    per_label = model.groupBy("label").agg(
        F.sum("c").cast("bigint").alias("n_l")
    )
    vocab_size = model.select("_h").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    d_total = label_stats.agg(F.sum("docs_l").cast("bigint").alias("d"))
    stats = (
        label_stats.join(per_label, "label", "left")
        .crossJoin(F.broadcast(vocab_size))
        .crossJoin(F.broadcast(d_total))
        .select(
            "label",
            F.coalesce("n_l", F.lit(0)).alias("n_l"),
            "docs_l", "v", "d",
        )
    )
    toks = C._tokens(target, id_col, text_col)
    matched = (
        toks.join(model.select("_h", "label", "c"), "_h")
        .groupBy("doc", "label")
        .agg(F.sum(F.log(F.col("c") + F.lit(1.0))).alias("s"))
    )
    doc_len = toks.groupBy("doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    base = (
        target.select(F.col(id_col).alias("doc"))
        .join(doc_len, "doc", "left")
        .select("doc", F.coalesce("n", F.lit(0)).alias("n"))
        .crossJoin(F.broadcast(stats))
        .join(matched, ["doc", "label"], "left")
    )
    score = (
        F.log(F.col("docs_l") / F.col("d"))
        + F.coalesce("s", F.lit(0.0))
        - F.col("n") * F.log((F.col("n_l") + F.col("v")).cast("double"))
    )
    scored = base.select(
        "doc", "label", F.round(score, 6).alias("_score")
    )
    w = Window.partitionBy("doc").orderBy(F.desc("_score"), F.asc("label"))
    out = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("doc").alias(id_col),
            F.col("label").alias("predicted"),
            F.col("_score").alias("nb_score"),
        )
    )
    return out, model


def run_old(spark: SparkSession, sf_dir: str) -> None:
    docs = load_table(spark, sf_dir, "documents")
    model = C.nb_fit(docs, label_col="source")
    stats = C.nb_label_stats(docs, label_col="source")
    out, m = nb_score_old(docs, model, stats)
    out.write.format("noop").mode("overwrite").save()
    m.unpersist()


def run_new(spark: SparkSession, sf_dir: str) -> None:
    QUERIES["llm_nb_source_classifier"].spark(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_session(app_name="nb-ab")
    spark.sparkContext.setLogLevel("ERROR")
    run_old(spark, sf_dir)
    run_new(spark, sf_dir)
    runs = {"old": [], "new": []}
    for _ in range(reps):
        for name, fn in (("old", run_old), ("new", run_new)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            runs[name].append(round(time.perf_counter() - t0, 3))
    for name in runs:
        print(
            f"{name}: min {min(runs[name]):.3f} med "
            f"{statistics.median(runs[name]):.3f} runs {runs[name]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
