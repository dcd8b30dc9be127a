"""Interleaved A/B: bucket-cap guard overhead on an UNTRIGGERED run.

Measures ``minhash_near_dup_pairs`` wall with ``max_bucket=None`` vs
``max_bucket=1000`` over a fully distinct corpus (no bucket comes near
the cap, so both variants emit identical pairs and the measured delta
is pure guard overhead: the band persist, the size aggregate, and the
anti/star broadcast probes). Variants alternate within one session so
ambient load cancels (COVERAGE.md item 14); report the per-variant
MIN.

Run: python tools/cap_overhead_ab.py [n_docs] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from solana_etl_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    spark = build_session(app_name="cap-overhead-ab")
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
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
    )
    docs.repartition(32).write.mode("overwrite").parquet(
        "/tmp/cap_ab_corpus"
    )
    docs = spark.read.parquet("/tmp/cap_ab_corpus")

    from solana_etl_pipeline_spark.llm.dedup import (
        dedup_cache_scope,
        minhash_near_dup_pairs,
    )

    walls: dict[str, list[float]] = {"uncapped": [], "capped": []}
    counts: dict[str, int] = {}

    def run(label: str, max_bucket: int | None) -> None:
        with dedup_cache_scope():
            t0 = time.perf_counter()
            n = minhash_near_dup_pairs(
                docs, "doc_id", "text",
                num_hashes=64, bands=16, threshold=0.5,
                max_bucket=max_bucket,
            ).count()
            w = time.perf_counter() - t0
        walls[label].append(w)
        counts[label] = n
        print(f"{label}: {n} pairs in {w:.2f}s", flush=True)

    run("uncapped", None)  # warm the JVM/codegen once before timing
    run("capped", 1000)
    walls = {"uncapped": [], "capped": []}
    for _ in range(reps):
        run("uncapped", None)
        run("capped", 1000)
    assert counts["uncapped"] == counts["capped"], counts
    mu, mc = min(walls["uncapped"]), min(walls["capped"])
    print(
        f"min uncapped {mu:.2f}s  min capped {mc:.2f}s  "
        f"overhead {100 * (mc / mu - 1):+.0f}%",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
