"""Per-query execution-shape profile: wall seconds, Spark JOB count,
stage count, task count for every registered query (or a named subset).

Why job count: every driver-side barrier (``collect()``, eager
``persist().count()``, ``localCheckpoint``, Lloyd iterations) shows up
as an extra job — at fixture scale those serial barriers, not bytes,
dominate wall time, and at 100 TB each one is a full cluster drain
(stragglers idle the fleet between jobs). Stage count approximates the
exchange count (shuffle boundaries) plus one scan stage per job.

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/query_profile.py \
        [query ...] > /tmp/profile.json

One warm-up execution of each profiled query precedes its measured run
so codegen/footer caches don't bill to the first query profiled.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from solana_etl_pipeline_spark.queries import QUERIES  # noqa: E402
from solana_etl_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = build_session(app_name="query-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    names = sys.argv[1:] or list(QUERIES)
    bad = [n for n in names if n not in QUERIES]
    if bad:
        raise SystemExit(f"unknown queries: {bad}")

    def execute(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warm-up: JVM classloading, codegen, parquet footer caches.
    execute(QUERIES[names[0]].spark(spark, sf_dir))
    spark.catalog.clearCache()

    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        spec = QUERIES[name]
        group = f"profile:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        execute(spec.spark(spark, sf_dir))
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is None:
                    continue
                n_stages += 1
                n_tasks += sinfo.numTasks
        out[name] = {
            "wall": round(wall, 3),
            "jobs": len(job_ids),
            "stages": n_stages,
            "tasks": n_tasks,
        }
        spark.catalog.clearCache()
        print(
            f"# {name}: {wall:6.3f}s jobs={len(job_ids)} "
            f"stages={n_stages} tasks={n_tasks}",
            file=sys.stderr,
        )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
