"""A/B timing for individual queries at a given SF.

Run: python tools/perf_ab.py <sf_dir> <query> [<query> ...]
Times each query N times in one session (noop sink), prints per-run
seconds. Clear cache between runs so persists don't leak across.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from solana_etl_pipeline_spark.queries import QUERIES  # noqa: E402
from solana_etl_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = build_session(app_name="perf-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up with the first requested query (not the flagship: the
    # sf_dir may be a partial fixture, e.g. the TPC-H-only sf1
    # rehearsal dir, where the flagship's events table is absent)
    QUERIES[names[0]].spark(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.catalog.clearCache()
    for name in names:
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: {runs}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
