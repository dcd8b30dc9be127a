"""TPC-H decade rehearsal: the join-heavy plans one decade past bench
scale (sf0.1 → sf1, ~600 k → ~6 M lineitem).

tools/scale_rehearsal.py measures the hygiene/dedup/ANN families at
10× fixture scale; this tool does the same for the JOIN-heavy TPC-H
plans, turning the "AQE/broadcast/skew choices hold at 100×" posture
from plan assertions into a measured sf0.1→sf1 curve.

sf1 derivation — 10× key-offset replication of the read-only sf0.1
fixtures: replica ``i`` adds ``i·|orders|`` to orderkeys, ``i·|cust|``
to custkeys, ``i·|part|`` to partkeys, ``i·|supp|`` to suppkeys;
``region``/``nation`` stay fixed (as in real TPC-H, where they are
constant-size at every SF). Every value distribution, per-key density,
predicate selectivity and join fan-in is preserved EXACTLY (ten
disconnected self-similar sub-universes), so a query whose wall time
grows super-linearly in the row count is exposing a plan problem, not
a data-shape change. Dimension tables grow 10× too — so a broadcast
that only worked because the dim was fixture-small stops broadcasting
here, which is part of the test.

Timing mirrors bench.py: noop-sink execution (materializes every
output column, no driver collect), one warm-up, per-query median of
interleaved sweeps.

Run::

    python tools/tpch_decade.py [--workdir DIR] [--reps 3]

Prints a markdown table (for COVERAGE.md) plus one JSON line. The
generated sf1 dir (~150 MB) is left in place for re-runs; delete the
workdir to reclaim.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF01 = "/root/testdata/sf0.1"

#: (table, [(key column, stride)]) — stride is the per-replica offset.
_REPLICATION = {
    "customer": [("c_custkey", 15_000)],
    "supplier": [("s_suppkey", 1_000)],
    "part": [("p_partkey", 20_000)],
    "orders": [("o_orderkey", 150_000), ("o_custkey", 15_000)],
    "lineitem": [
        ("l_orderkey", 150_000),
        ("l_partkey", 20_000),
        ("l_suppkey", 1_000),
    ],
}
_COPY = ("region", "nation")

QUERY_NAMES = (
    "tpch_q1_pricing_summary",       # wide agg, no join
    "tpch_q5_local_supplier_volume", # 6-way join through region
    "tpch_q9_product_profit",        # 6-way join, part filter
    "tpch_q18_large_orders",         # agg-then-semijoin (HAVING)
    "tpch_q21_waiting_supplier",     # exists/not-exists double corr.
)


def ensure_sf1(spark, workdir: str) -> str:
    """Build the replicated sf1 dir if absent; return its path."""
    from pyspark.sql import functions as F

    dst = Path(workdir) / "sf1"
    marker = dst / "_DECADE_OK"
    if marker.exists():
        return str(dst)
    dst.mkdir(parents=True, exist_ok=True)
    replicas = spark.range(10).select(F.col("id").alias("_rep"))
    for name in _COPY:
        spark.read.parquet(f"{SF01}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(str(dst / f"{name}.parquet"))
    for name, strides in _REPLICATION.items():
        df = spark.read.parquet(f"{SF01}/{name}.parquet")
        rep = df.crossJoin(F.broadcast(replicas))
        for col, stride in strides:
            rep = rep.withColumn(
                col, F.col(col) + F.col("_rep") * F.lit(stride)
            )
        rep.drop("_rep").repartition(32).write.mode("overwrite").parquet(
            str(dst / f"{name}.parquet")
        )
    marker.touch()
    return str(dst)


def time_queries(spark, sf_dir: str, reps: int) -> dict[str, float]:
    from solana_etl_pipeline_spark.queries import QUERIES

    def execute(df):
        df.write.format("noop").mode("overwrite").save()

    execute(QUERIES[QUERY_NAMES[0]].spark(spark, sf_dir))  # warm-up
    runs: dict[str, list[float]] = {n: [] for n in QUERY_NAMES}
    for _ in range(reps):
        for name in QUERY_NAMES:
            t0 = time.perf_counter()
            execute(QUERIES[name].spark(spark, sf_dir))
            runs[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    return {
        n: round(sorted(r)[len(r) // 2], 3) for n, r in runs.items()
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default=str(REPO / ".rehearsal"))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    from solana_etl_pipeline_spark.session import build_session

    spark = build_session(app_name="tpch-decade")
    spark.sparkContext.setLogLevel("ERROR")

    sf1_dir = ensure_sf1(spark, args.workdir)
    t01 = time_queries(spark, SF01, args.reps)
    t1 = time_queries(spark, sf1_dir, args.reps)

    print("\n| query | sf0.1 (s) | sf1 (s) | ratio (10x rows) |")
    print("|---|---|---|---|")
    ratios = {}
    for n in QUERY_NAMES:
        ratios[n] = round(t1[n] / t01[n], 2) if t01[n] else None
        print(f"| {n} | {t01[n]} | {t1[n]} | {ratios[n]}x |")
    print()
    print(json.dumps({
        "sf01": t01, "sf1": t1, "ratio": ratios, "reps": args.reps,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
