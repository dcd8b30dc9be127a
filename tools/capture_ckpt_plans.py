"""Dump explain('formatted') + pre-checkpoint stage plans for queries
whose hot path hides behind localCheckpoint (pagerank, CC survivors).

Usage::

    python tools/capture_ckpt_plans.py <outfile> <query> [<query> ...]

The final plan of such a query is just a scan of checkpointed
partitions, so the committed evidence includes every plan captured by
``record_pre_checkpoint`` during query construction (the audit hook
built for exactly this — plans/audit.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from solana_etl_pipeline_spark.plans.audit import (  # noqa: E402
    capture_pre_checkpoint_plans,
)
from solana_etl_pipeline_spark.queries import QUERIES  # noqa: E402
from solana_etl_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    outfile = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="capture-ckpt-plans")
    spark.sparkContext.setLogLevel("ERROR")
    chunks = []
    for name in names:
        with capture_pre_checkpoint_plans() as captured:
            df = QUERIES[name].spark(spark, sf_dir)
        final = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        chunks.append(f"==== {name}: final plan ====\n{final}")
        for rec in captured:
            chunks.append(
                f"==== {name}: pre-checkpoint stage "
                f"{rec['stage']} ====\n{rec['plan']}"
            )
        spark.catalog.clearCache()
    with open(outfile, "w") as fh:
        fh.write("\n".join(chunks))
    text = "\n".join(chunks)
    print(
        f"wrote {outfile}: {len(chunks)} plan blocks, "
        f"{text.count('Exchange')} Exchange refs"
    )
    spark.stop()


if __name__ == "__main__":
    main()
