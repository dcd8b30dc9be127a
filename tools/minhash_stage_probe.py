"""Inner decomposition of the minhash candidate stage.

`tools/survivors_stage_decomp.py` localized the survivors pipeline's
superlinear decade scaling (x8.67 wall for x5 data, 2 M -> 10 M docs)
to the minhash stage; this probe splits that stage into its two
halves to find the culprit:

  sig    Arrow signature UDF over the persisted shingle table,
         persisted + materialized (includes the per-shingle crc32
         Python loop and the numpy permutation outer product)
  band   band explode + bucket self-join + dropDuplicates over the
         persisted signatures
  est    candidate re-join of full signatures + est_jaccard filter

Run:  python tools/minhash_stage_probe.py [--sizes 2000000,10000000]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from solana_etl_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_rehearsal import (  # noqa: E402
    build_corpus,
    size_rehearsal_heap,
    timed,
)
from tools.survivors_stage_decomp import noop  # noqa: E402


def run_probe(spark, docs, n: int) -> dict[str, float]:
    from solana_etl_pipeline_spark.llm.dedup import (
        _scoped_persist,
        dedup_cache_scope,
        minhash_near_dup_pairs,
        minhash_signatures,
        shingle_sets,
    )

    walls: dict[str, float] = {}
    with dedup_cache_scope():
        sh = _scoped_persist(shingle_sets(docs, "doc_id", "text", 3))
        noop(sh)  # materialize outside the timed legs
        sigs = _scoped_persist(
            minhash_signatures(docs, "doc_id", "text", 64, 3, shingles=sh)
        )
        walls["sig"] = timed(f"sig ({n})", lambda: noop(sigs))
        # full candidate run with signatures already cached: times the
        # band explode + self-join + dedup + est re-join only
        cand = minhash_near_dup_pairs(
            docs, "doc_id", "text",
            num_hashes=64, bands=16, threshold=0.5, shingles=sh,
        )
        walls["band+est"] = timed(f"band+est ({n})", lambda: noop(cand))
    return walls


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2000000,10000000")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    workdir = args.workdir or tempfile.mkdtemp(prefix="mh_probe_")

    size_rehearsal_heap()
    spark = build_session(app_name="minhash-stage-probe")
    spark.sparkContext.setLogLevel("ERROR")

    by_size: dict[int, dict[str, float]] = {}
    for n in sizes:
        corpus_dir = f"{workdir}/corpus_{n}"
        timed(
            f"generate+land corpus ({n})",
            lambda: build_corpus(spark, n, corpus_dir),
        )
        docs = spark.read.parquet(corpus_dir)
        by_size[n] = run_probe(spark, docs, n)
        spark.catalog.clearCache()
        shutil.rmtree(corpus_dir, ignore_errors=True)

    if len(sizes) >= 2:
        a, b = sizes[0], sizes[-1]
        for stage in by_size[a]:
            ra, rb = by_size[a][stage], by_size[b][stage]
            print(
                f"{stage}: {ra:.1f}s @ {a} -> {rb:.1f}s @ {b} "
                f"(x{rb / ra:.2f} wall for x{b / a:.0f} data)",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
