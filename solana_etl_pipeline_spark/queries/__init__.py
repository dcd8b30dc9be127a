"""Query registry: every driver-visible query, merged across modules.

Each module contributes a ``QUERIES: dict[str, QuerySpec]``; this
package merges them (names must be globally unique) so the driver
adapter (``__spark_entry__.py``) and the bench harness (``bench.py``)
see one flat registry.
"""

from __future__ import annotations

from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.queries import aggs as _aggs
from solana_etl_pipeline_spark.queries import curation as _curation
from solana_etl_pipeline_spark.queries import export as _export
from solana_etl_pipeline_spark.queries import functions_zoo as _functions_zoo
from solana_etl_pipeline_spark.queries import hygiene as _hygiene
from solana_etl_pipeline_spark.queries import io as _io
from solana_etl_pipeline_spark.queries import joins as _joins
from solana_etl_pipeline_spark.queries import llm as _llm
from solana_etl_pipeline_spark.queries import misc as _misc
from solana_etl_pipeline_spark.queries import nested as _nested
from solana_etl_pipeline_spark.queries import quality as _quality
from solana_etl_pipeline_spark.queries import ranking as _ranking
from solana_etl_pipeline_spark.queries import reference as _reference
from solana_etl_pipeline_spark.queries import setops as _setops
from solana_etl_pipeline_spark.queries import sorts as _sorts
from solana_etl_pipeline_spark.queries import streaming as _streaming
from solana_etl_pipeline_spark.queries import tpch as _tpch
from solana_etl_pipeline_spark.queries import tpch_deep as _tpch_deep
from solana_etl_pipeline_spark.queries import tpch_derived as _tpch_derived
from solana_etl_pipeline_spark.queries import windows as _windows

QUERIES: dict[str, QuerySpec] = {}

for _mod in (
    _reference,
    _joins,
    _windows,
    _setops,
    _sorts,
    _aggs,
    _nested,
    _llm,
    _streaming,
    _io,
    _functions_zoo,
    _misc,
    _tpch,
    _tpch_deep,
    _tpch_derived,
    _quality,
    _ranking,
    _curation,
    _export,
    _hygiene,
):
    for _name, _spec in _mod.QUERIES.items():
        if _name in QUERIES:  # pragma: no cover - registry bug guard
            raise ValueError(f"duplicate query name: {_name}")
        QUERIES[_name] = _spec

# Driver-facing ordering. The verify harness checks a prefix of the
# registry (~50 queries per round), so the order is score-bearing.
# Rounds 2-3 front-loaded one query per SURVEY §2 component family
# (all driver-green in CORRECTNESS_r03); round 4 rotated in the
# TPC-H suite, rollup/cube, window variants, quality/io and the r4
# self-banded/ranking/curation queries (all green in
# CORRECTNESS_r04). Round 5 front-loads the last queries with no
# driver CORRECTNESS row: the three registered after the r4 prefix
# was packed (llm_export_shards, llm_token_heavy_hitters,
# sink_zorder_roundtrip), the seven near-dup/ANN queries that
# gained self-banded oracles this round (previously rows-only by
# contract), and the five queries newly registered in r5 (session
# windows + the corpus-hygiene family). The remaining slots
# re-witness r3 greens — the longest-unwitnessed rows — so every
# query's most recent green row is at most two rounds old.
_PRIORITY = (
    # --- round-5 prefix ---
    # oracle-paired but never driver-witnessed (registered post-r4-
    # prefix; judge-verified at sf0.01 in r4)
    "llm_export_shards",
    "llm_token_heavy_hitters",
    "sink_zorder_roundtrip",
    # near-dup/ANN family: gained self-banded oracles in r5
    # (exact-verified output or planted-probe form — queries/llm.py)
    "llm_minhash_near_dup",
    "llm_simhash_near_dup",
    "llm_near_dup_survivors",
    "llm_embedding_near_dup",
    "llm_lsh_cosine_topk",
    "llm_ivf_cosine_topk",
    "llm_incremental_near_dup",
    # registered in r5: streaming session_window state (new coverage)
    "streaming_session_windows",
    # registered in r5: corpus-hygiene family (queries/hygiene.py)
    "llm_decontaminate",
    "llm_repetition_rules",
    "llm_mixture_sample",
    "llm_chunk_documents",
    # registered in r5: stream-stream interval join (§2.9)
    "streaming_interval_join",
    # registered in r5: deterministic train/val/test split
    "llm_split_assign",
    # registered in r5: CCNet-style unigram LM quality score
    "llm_lm_quality_score",
    # --- re-witness: r3 greens (oldest rows), r3 order ---
    "risk_scores_topk",
    "risk_banding_report",
    "events_json_extract_agg",
    "nested_helius_flatten",
    "nested_explode_padding",
    "nested_tojson_roundtrip",
    "nested_array_access",
    "typed_props_parse",
    "events_project_filter",
    "events_not_in_filter",
    "negative_substring_filter",
    "epoch_rendering_pst",
    "timestamp_parse_roundtrip",
    "string_functions_zoo",
    "regexp_extract_sources",
    "join_broadcast_lookup",
    "join_left_anti",
    "join_theta_range",
    "nullsafe_join_counts",
    "asof_prior_purchase",
    "skew_salted_join_priority_revenue",
    "window_topk_per_hour",
    "window_sessionize_batch",
    "setop_union_harmonize",
    "setop_except_all",
    "sort_topk_recent",
    "agg_first_latest_per_group",
    "agg_active_users_threshold",
    "events_dedup_by_key",
    "agg_grouping_sets",
    "agg_percentiles_stddev",
    "streaming_hourly_rollup",
    # --- position 51+: r3 greens not re-witnessed this round (the
    # r5 insertions displaced the eight below — each holds an r3
    # driver-green row), then the r4-green prefix in its r4 order ---
    "streaming_sliding_windows",
    "sink_parquet_partitioned",
    "sink_csv_roundtrip",
    "sink_json_roundtrip",
    "enrich_risk_grouped_map",
    "enrich_http_lookup",
    "udtf_word_chunks",
    "pivot_event_values",
    "llm_exact_dedup",
    "llm_text_stats",
    "llm_token_count",
    "llm_quality_banding",
    "llm_lang_id",
    "llm_fingerprint",
    "llm_ngram_jaccard",
    "llm_cosine_topk",
    "llm_multimodal_featurize",
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier_cnt",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_filter",
    "tpch_q20_promotion_suppliers",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    "events_hourly_rollup",
    "events_value_banding",
    "events_pst_rendering",
    "token_detail_view",
    "join_left_semi",
    "join_fact_revenue",
    "window_lag_delta",
    "window_running_sum",
    "window_rank_customers",
    "setop_intersect",
    "distinct_event_types",
    "agg_rollup_returnflag",
    "agg_cube_orders",
    "agg_collect_set_sorted",
    "nested_dispatch_agg",
    "unpivot_lineitem_metrics",
    "skew_salted_user_rollup",
    "data_quality_report",
    "data_quality_split",
    "normalized_exact_dedup",
    "risk_scores_topk_approx",
    "sketch_rollup_distinct_users",
    "sample_stratified",
    "llm_tfidf_top_terms",
    "llm_bm25_search",
    "llm_pii_redact",
    "llm_pack_sequences",
    "llm_corpus_filter",
)

_missing = [n for n in _PRIORITY if n not in QUERIES]
if _missing:  # pragma: no cover - registry bug guard
    raise ValueError(f"priority list references unknown queries: {_missing}")
QUERIES = {
    **{n: QUERIES[n] for n in _PRIORITY},
    **{n: s for n, s in QUERIES.items() if n not in _PRIORITY},
}

__all__ = ["QUERIES", "QuerySpec"]
