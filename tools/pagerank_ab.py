"""Interleaved A/B/C of the pagerank degree-join forms over the
graph_pagerank_parts pipeline (r17 — VERDICT r16 item 4: the r16
broadcast-degree change went UP in the committed bench; decide by a
clean interleaved measurement at the driver's core count).

Forms:
  shuffle    r15: edged = und ⋈ deg (shuffle join; Catalyst reuses the
             und exchange for the degree aggregate, so the symmetrized
             edge subtree executes ONCE)
  broadcast  r16: edged = und ⋈ broadcast(deg) — no src-exchange of
             und, but the degree build executes the und subtree a
             SECOND time (no exchange to reuse)
  ckpt_bcast r17 candidate: und localCheckpointed first, degree
             aggregated from the checkpoint, then broadcast-joined —
             one subtree execution AND no src-exchange, at the cost of
             one extra materialization barrier

Run: SPARK_GRAFT_CPUS=32 python tools/pagerank_ab.py <sf_dir> [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from solana_etl_pipeline_spark.queries.analytics import (  # noqa: E402
    PAGERANK_DAMPING,
    PAGERANK_ITERS,
    PAGERANK_TOP,
)
from solana_etl_pipeline_spark.session import build_session  # noqa: E402
from solana_etl_pipeline_spark.sources import load_table  # noqa: E402

ITER_ROUND = 9


def pagerank_form(edges: DataFrame, form: str) -> DataFrame:
    und = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")
    if form == "ckpt_bcast":
        und = und.localCheckpoint(eager=True)
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    if form == "shuffle":
        edged = und.join(deg, "src")
    else:
        edged = und.join(F.broadcast(deg), "src")
    edged = edged.localCheckpoint(eager=True)

    nodes = edged.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()
    init = F.round(F.lit(1.0) / F.lit(float(n_nodes)), ITER_ROUND)
    ranks = nodes.select("node", init.alias("rank"))
    teleport = (1.0 - PAGERANK_DAMPING) / float(n_nodes)
    for _ in range(PAGERANK_ITERS):
        rank_side = F.broadcast(ranks)
        contrib = (
            edged.join(rank_side, edged["src"] == rank_side["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = contrib.select(
            "node",
            F.round(
                F.lit(teleport) + F.lit(PAGERANK_DAMPING) * F.col("mass"),
                ITER_ROUND,
            ).alias("rank"),
        )
        ranks = ranks.localCheckpoint(eager=False)
    return ranks


def run_query(spark: SparkSession, sf_dir: str, form: str) -> None:
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    ranks = pagerank_form(edges, form)
    label = F.when(
        F.col("node").bitwiseAND(1) == 0,
        F.concat(F.lit("p:"), F.shiftright("node", 1).cast("string")),
    ).otherwise(
        F.concat(F.lit("s:"), F.shiftright("node", 1).cast("string"))
    )
    out = (
        ranks.select(label.alias("node"), F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(PAGERANK_TOP)
    )
    out.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    forms = ["shuffle", "broadcast", "ckpt_bcast"]
    spark = build_session(app_name="pagerank-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up one full run of each form
    for form in forms:
        run_query(spark, sf_dir, form)
    runs: dict[str, list[float]] = {f: [] for f in forms}
    for _ in range(reps):
        for form in forms:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run_query(spark, sf_dir, form)
            runs[form].append(round(time.perf_counter() - t0, 3))
    for form in forms:
        print(
            f"{form}: min {min(runs[form]):.3f} med "
            f"{statistics.median(runs[form]):.3f} runs {runs[form]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
