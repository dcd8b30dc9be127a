"""Probe: does whole-stage-codegen cache thrash tax the multi-query
bench? (r17, VERDICT item 5 — the ~0.2-0.3 s/query session floor.)

Spark's generated-class cache (``spark.sql.codegen.cache.maxEntries``,
STATIC conf, default 100 entries) is keyed by generated source; a
sweep over 173 distinct queries emits far more than 100 codegen units,
so by the time a sweep returns to query #1 its classes are evicted and
every rep pays Janino + JIT again. This runs N sweeps over a
representative query subset in ONE session and prints per-sweep
totals; run it once with the default and once with a large cache::

    SPARK_GRAFT_CPUS=32 python tools/codegen_cache_probe.py 100
    SPARK_GRAFT_CPUS=32 python tools/codegen_cache_probe.py 5000

Sweep 1 compiles everything either way; sweeps 2+ diverge iff
eviction is the mechanism.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from solana_etl_pipeline_spark.queries import QUERIES  # noqa: E402
from solana_etl_pipeline_spark.session import build_session  # noqa: E402

SUBSET = [
    # cheap floor-dominated queries across families
    "distinct_event_types", "events_value_banding", "events_pst_rendering",
    "setop_intersect", "agg_rollup_returnflag", "agg_cube_orders",
    "window_lag_delta", "window_running_sum", "window_rank_customers",
    "join_left_semi", "join_fact_revenue", "llm_exact_dedup",
    "llm_cosine_topk", "llm_paragraph_dedup", "llm_lm_quality_score",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q4_order_priority", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "tpch_q10_returned_items", "tpch_q12_shipmode_priority",
    "tpch_q14_promo_revenue", "tpch_q19_disjunctive_filter",
    "risk_scores_topk", "events_hourly_rollup", "events_dedup_by_key",
    "window_topk_per_hour", "sketch_cms_user_counts",
    "unpivot_lineitem_metrics", "data_quality_report",
    "orders_mom_revenue", "attribution_last_touch", "sample_stratified",
    "llm_tfidf_top_terms", "llm_bm25_search", "llm_pmi_bigrams",
    "drift_psi_report", "session_paths_topk",
]


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    entries = sys.argv[1] if len(sys.argv) > 1 else "100"
    sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(
        app_name=f"codegen-probe-{entries}",
        extra_confs={"spark.sql.codegen.cache.maxEntries": entries},
    )
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["risk_scores_topk"].spark(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    for sweep in range(sweeps):
        t0 = time.perf_counter()
        per = []
        for name in SUBSET:
            q0 = time.perf_counter()
            QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            per.append(time.perf_counter() - q0)
            spark.catalog.clearCache()
        print(
            f"maxEntries={entries} sweep {sweep + 1}: total "
            f"{time.perf_counter() - t0:.2f}s  mean/query "
            f"{sum(per) / len(per):.3f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
