"""Same-session A/B: shuffle-partition count vs the 10 M-doc
survivors wall.

The r11 clean-window third-decade re-pin (COVERAGE convention 7)
showed `near_dup_survivors` superlinear between 2 M and 10 M docs
(x8.44 wall for x5 data) while `substring_dedup` stayed sublinear.
Hypothesis: the engine's local default `spark.sql.shuffle.partitions
= 32` (sized to the core count, right at fixture scale) leaves
~5 M-row shuffle partitions at 10 M docs — the band-entries table is
n_docs x bands rows — so sort/join buffers spill where the 2 M corpus
still fits. AQE can only COALESCE below the initial partition count,
never split above it (skew-join splitting applies just to the join
sides), so the fixed initial count is the binding knob.

This harness generates the 10 M corpus once, then interleaves
survivors runs at partitions = A, B, A (ABA to control ambient
drift), setting `spark.sql.shuffle.partitions` at runtime between
legs. If the spill hypothesis holds, the B legs drop well below A.

Run:  python tools/survivors_partition_ab.py [--n 10000000]
          [--a 32 --b 256] [--workdir D]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from solana_etl_pipeline_spark.session import build_session  # noqa: E402
from tools.scale_rehearsal import (  # noqa: E402
    build_corpus,
    size_rehearsal_heap,
    timed,
)
from tools.second_decade import run_survivors  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--a", type=int, default=32)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    workdir = args.workdir or tempfile.mkdtemp(prefix="surv_ab_")

    size_rehearsal_heap()
    spark = build_session(app_name="survivors-partition-ab")
    spark.sparkContext.setLogLevel("ERROR")

    corpus_dir = f"{workdir}/corpus_{args.n}"
    timed(
        f"generate+land corpus ({args.n})",
        lambda: build_corpus(spark, args.n, corpus_dir),
    )
    docs = spark.read.parquet(corpus_dir)

    for parts in (args.a, args.b, args.a):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        timed(
            f"near_dup_survivors ({args.n}, partitions={parts})",
            lambda: run_survivors(spark, docs),
        )
        spark.catalog.clearCache()

    shutil.rmtree(corpus_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
