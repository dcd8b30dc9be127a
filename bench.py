"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is fully executed via the ``noop`` sink — unlike ``count()``,
which lets Catalyst prune computed columns, a noop write materializes
every output column without collecting to the driver. Warm-up: one
throwaway run of the flagship so JVM/codegen startup isn't billed to the
first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

from solana_etl_pipeline_spark.queries import QUERIES
from solana_etl_pipeline_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # one long-lived JVM runs all ~70 queries; a larger heap keeps GC
    # from taxing the later ones (overridable via env)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = build_session(app_name="solana-etl-pipeline-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def execute(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warm-up: JVM classloading, codegen, parquet footer caches.
    execute(QUERIES["risk_scores_topk"].spark(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, spec in QUERIES.items():
        t0 = time.perf_counter()
        execute(spec.spark(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
