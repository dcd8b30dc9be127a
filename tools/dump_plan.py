"""Dump ``explain('formatted')`` for named queries to files.

Usage::

    python tools/dump_plan.py <suffix> <query> [<query> ...]

Writes ``plans/r16/<query>_<suffix>.txt`` (suffix = before/after).
Runs at sf0.1 (plan shape, not data, is what's captured; sf only
affects AQE's initial stats).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from solana_etl_pipeline_spark.queries import QUERIES  # noqa: E402
from solana_etl_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("plans/r16", exist_ok=True)
    for name in names:
        df = QUERIES[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = f"plans/r16/{name}_{suffix}.txt"
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out} ({plan.count('Exchange')} Exchange refs)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
