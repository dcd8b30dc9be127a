"""Interleaved A/B of a runtime SQL conf over a query set.

Run::

    SPARK_GRAFT_CPUS=32 python tools/conf_ab.py <sf_dir> \
        <conf_key> <value_a> <value_b> <query> [<query> ...]

One session; per query the conf alternates A,B,A,B,... for
``SPARK_GRAFT_AB_REPS`` (default 5) pairs, cache cleared between runs,
so ambient machine drift hits both arms equally (the r16 lesson: a
single-run bench comparison here swings ±20-40%). Prints per-query
min/median per arm plus the geomean of min-ratios (B/A) — B wins when
the ratio is < 1.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from solana_etl_pipeline_spark.queries import QUERIES  # noqa: E402
from solana_etl_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir, key, val_a, val_b = sys.argv[1:5]
    names = sys.argv[5:]
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "5"))
    spark = build_session(app_name="conf-ab")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["risk_scores_topk"].spark(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    results: dict[str, dict[str, list[float]]] = {}
    for name in names:
        runs: dict[str, list[float]] = {val_a: [], val_b: []}
        for _ in range(reps):
            for val in (val_a, val_b):
                spark.conf.set(key, val)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                QUERIES[name].spark(spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                runs[val].append(round(time.perf_counter() - t0, 3))
        results[name] = runs
        ma, mb = min(runs[val_a]), min(runs[val_b])
        print(
            f"# {name}: A({val_a}) min {ma:.3f} med "
            f"{statistics.median(runs[val_a]):.3f} | B({val_b}) min "
            f"{mb:.3f} med {statistics.median(runs[val_b]):.3f} | "
            f"B/A min-ratio {mb / ma:.3f}",
            file=sys.stderr,
            flush=True,
        )
    ratios = [
        min(r[val_b]) / min(r[val_a]) for r in results.values()
    ]
    geo = statistics.geometric_mean(ratios)
    print(json.dumps({"conf": key, "a": val_a, "b": val_b,
                      "geomean_min_ratio_b_over_a": round(geo, 4),
                      "runs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
