"""Mega-bucket pathology rehearsal: the LSH bucket cap under mass
duplication.

Web-scale corpora concentrate boilerplate: ONE band bucket holding s
members makes the candidate self-join emit s·(s-1)/2 pairs — at
s = 5 M (a footer shared by 5 M pages) that is 1.25e13 pairs from a
single bucket, a job no partitioning survives. ``max_bucket`` (added
round 10 to ``minhash_near_dup_pairs`` / ``simhash_candidate_pairs``)
degrades oversize buckets from clique to star edges, keeping
connected-components dedup resolutions identical for the
mass-duplication case while bounding the join output linearly.

This rehearsal plants a clone cluster inside a distinct corpus and
measures the clique-vs-star wall + pair volume at a scale where the
quadratic already hurts but still finishes (so both sides are
measurable; the production case is the one that does NOT finish).

Run: python tools/mega_bucket_rehearsal.py [n_docs] [n_clones]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from solana_etl_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_clones = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000

    spark = build_session(app_name="mega-bucket-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    from tools.scale_rehearsal import VOCAB

    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda i: F.element_at(
            vocab_arr,
            (F.pmod(F.xxhash64(F.col("id"), i), F.lit(len(VOCAB))) + 1)
            .cast("int"),
        ),
    )
    boiler = " ".join(f"boil{j}" for j in range(30))
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_clones, F.lit(boiler))
        .otherwise(F.concat_ws(" ", words))
        .alias("text"),
    )
    docs.repartition(32).write.mode("overwrite").parquet(
        "/tmp/mega_bucket_corpus"
    )
    docs = spark.read.parquet("/tmp/mega_bucket_corpus")

    from solana_etl_pipeline_spark.llm.cluster import near_dup_dedup
    from solana_etl_pipeline_spark.llm.dedup import (
        dedup_cache_scope,
        minhash_near_dup_pairs,
    )

    def run(label: str, max_bucket: int | None, resolve: bool = False):
        with dedup_cache_scope():
            t0 = time.perf_counter()
            pairs = minhash_near_dup_pairs(
                docs, "doc_id", "text",
                num_hashes=64, bands=16, threshold=0.5,
                max_bucket=max_bucket,
            )
            n_pairs = pairs.count()
            wall = time.perf_counter() - t0
            print(f"{label}: {n_pairs} pairs in {wall:.1f}s", flush=True)
            if resolve:
                t0 = time.perf_counter()
                n_surv = near_dup_dedup(docs, pairs, "doc_id").count()
                print(
                    f"{label} + CC resolve: {n_surv} survivors in "
                    f"{time.perf_counter() - t0:.1f}s",
                    flush=True,
                )

    print(f"n_docs={n_docs} n_clones={n_clones} "
          f"(clique would be {n_clones * (n_clones - 1) // 2} pairs)",
          flush=True)
    run("capped (max_bucket=1000)", 1000, resolve=True)
    run("uncapped clique", None)
    spark.stop()


if __name__ == "__main__":
    main()
