"""Query registry: every driver-visible query, merged across modules.

Each module contributes a ``QUERIES: dict[str, QuerySpec]``; this
package merges them (names must be globally unique) so the driver
adapter (``__spark_entry__.py``) and the bench harness (``bench.py``)
see one flat registry.
"""

from __future__ import annotations

from solana_etl_pipeline_spark.queries.base import QuerySpec
from solana_etl_pipeline_spark.queries import aggs as _aggs
from solana_etl_pipeline_spark.queries import analytics as _analytics
from solana_etl_pipeline_spark.queries import classify as _classify
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
from solana_etl_pipeline_spark.queries import timeseries as _timeseries
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
    _timeseries,
    _ranking,
    _curation,
    _export,
    _hygiene,
    _classify,
    _analytics,
):
    for _name, _spec in _mod.QUERIES.items():
        if _name in QUERIES:  # pragma: no cover - registry bug guard
            raise ValueError(f"duplicate query name: {_name}")
        QUERIES[_name] = _spec

# Driver-facing ordering. The verify harness checks a prefix of the
# registry (~50 queries per round), so the order is score-bearing.
# Rotation invariant (see README.md "Prefix rotation" and
# tools/staleness.py): every witnessed query's most recent
# driver-green CORRECTNESS row must be at most invariant_bound() =
# ceil(len(QUERIES) / 50) rounds old — the bound is derived from
# rotation arithmetic (a full rotation takes ceil(len(QUERIES)/50)
# rounds), replacing the round<=7 hand-written "two rounds" invariant
# that was unsatisfiable at this registry size. Each round the full
# ordering is regenerated mechanically with
#     python tools/staleness.py --budget "$(number of queries)"
# (the bound itself always derives from the live len(QUERIES) and the
# driver's 50-row prefix — no count is hand-maintained here; --budget
# only controls how much of the ordering the tool emits, so pass the
# registry size to regenerate the whole tuple below).
# Tiers: (1) witnessed queries that would breach the bound next round,
# (2) never-witnessed queries (first-witness priority), (3) queries
# promoted via --promote (plan-changed this round: a rewritten plan
# needs a fresh witness regardless of staleness — VERDICT r11 task 1),
# (4) remaining witnessed queries stalest-first. The round-15 ordering
# below is the tool's verbatim output at r14 HEAD:
#     python tools/staleness.py --budget 173 \
#         --promote cdc_apply_documents,llm_incremental_near_dup
# cdc_apply_documents is promoted because its result-bearing code
# changed this round (unknown op codes now fail loud via raise_error
# instead of silently deleting the key — the fixture feed has only
# valid ops, so the oracle is unchanged, but the rewritten filter
# needs a fresh witness); llm_incremental_near_dup because the
# band-hash construction moved to the shared dedup.band_rows helper
# (expression-identical — promoted under the same convention).
# They are followed by the 25 r11-witnessed queries at staleness 3
# that would hit the bound of 4 next round (VERDICT r14 task 1 names
# all 25 — still inside the 50-row driver window at positions 3-27),
# then the staleness-2/1/0 blocks stalest-first.
_PRIORITY = (
    "cdc_apply_documents",
    "llm_incremental_near_dup",
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
    "data_skew_report",
    "attribution_last_touch",
    "orders_mom_revenue",
    "llm_megabucket_star_survivors",
    "llm_minhash_near_dup",
    "llm_simhash_near_dup",
    "llm_embedding_near_dup",
    "llm_near_dup_survivors",
    "graph_pagerank_parts",
    "order_fulfillment_latency",
    "events_seasonal_anomalies",
    "sketch_hll_overlap",
    "llm_source_vocab_overlap",
    "events_ewma_hourly",
    "data_ref_integrity",
    "profile_events_columns",
    "llm_label_centroids",
    "events_interval_coverage",
    "basket_part_pairs",
    "user_rfm_segments",
    "data_benford_digits",
    "session_paths_topk",
    "events_gapfill_locf",
    "events_time_weighted_avg",
    "drift_psi_report",
    "llm_pmi_bigrams",
    "llm_weighted_sample",
    "events_transition_matrix",
    "pareto_top_parts",
    "events_ohlc_bars",
    "agg_corr_regression",
    "scd2_state_intervals",
    "llm_inverted_index",
    "llm_edit_distance_near_dup",
    "llm_quota_sample",
    "events_cohort_retention",
    "window_trailing_zscore",
    "sketch_quantile_approx",
    "snapshot_diff_documents",
    "streaming_interval_join_outer",
    "sink_orc_roundtrip",
    "llm_gopher_rules",
    "llm_c4_line_filter",
    "llm_url_dedup",
    "llm_substring_dedup",
    "llm_ccnet_buckets",
    "llm_bpe_top_pairs",
    "llm_export_shards",
    "llm_token_heavy_hitters",
    "sink_zorder_roundtrip",
    "llm_lsh_cosine_topk",
    "llm_ivf_cosine_topk",
    "streaming_session_windows",
    "llm_decontaminate",
    "llm_repetition_rules",
    "llm_mixture_sample",
    "llm_chunk_documents",
    "streaming_interval_join",
    "llm_split_assign",
    "llm_lm_quality_score",
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
    "llm_paragraph_dedup",
    "llm_pq_cosine_topk",
    "sketch_cms_user_counts",
    "llm_dsir_select",
    "llm_domain_rollup",
    "llm_ivfpq_cosine_topk",
    "llm_nb_source_classifier",
    "llm_image_header_stats",
    "llm_media_header_stats",
    "llm_semantic_dedup",
    "agg_histogram_quantiles",
    "funnel_conversion_steps",
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
)

_missing = [n for n in _PRIORITY if n not in QUERIES]
if _missing:  # pragma: no cover - registry bug guard
    raise ValueError(f"priority list references unknown queries: {_missing}")
QUERIES = {
    **{n: QUERIES[n] for n in _PRIORITY},
    **{n: s for n, s in QUERIES.items() if n not in _PRIORITY},
}

__all__ = ["QUERIES", "QuerySpec"]
