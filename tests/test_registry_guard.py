"""Registry-registration guard.

Prevents the decorator-stacking bug class: a query block inserted between
another query's ``@query`` decorator and its ``def`` silently re-points the
registered name at the wrong builder (incident ``e56ddd5``, where
``bpe_segmentation`` executed the Viterbi builder until the local oracle gate
caught the row-count drift).

Structural invariants pinned here:

1. Every registered name maps to a builder whose ``__name__`` is either the
   canonical ``q_<name>`` or the frozen alias recorded below. The alias table
   is a snapshot of the registry on a day the FULL oracle gate (266/266 at
   sf0.01) was green, so every pairing in it is hash-verified correct. Adding
   a query means adding either a canonical ``q_<name>`` builder (no table
   edit) or one deliberate alias line — a stacking accident instead *changes*
   an existing pairing and fails loudly.
2. No builder function object is registered under two names (the direct
   signature of stacked ``@query`` decorators on one ``def``).
3. Every oracle is either None (rows-only, must carry a reason tag) or a
   non-empty SQL string.
"""

from __future__ import annotations

from collections import defaultdict

from cartography_spark.plans.registry import _ordered

# name -> builder __name__, for builders not named q_<name>. Frozen from the
# fully-oracle-green registry; edit only when deliberately registering a new
# aliased builder.
KNOWN_ALIASES = {
    "agg_pricing_summary": "q_agg_pricing",
    "analysis_semgrep_risk_matrix": "q_analysis_semgrep_risk",
    "argmax_mergeable_top1": "q_argmax_top1",
    "asof_join_attribution": "q_asof_attribution",
    "asof_join_forward_next": "q_asof_forward",
    "asof_join_nearest": "q_asof_nearest",
    "asof_join_tolerance": "q_asof_tolerance",
    "big_spender_orders": "q_big_spenders",
    "cartesian_product_link": "q_cartesian_link",
    "case_when_mapping": "q_case_when",
    "cdc_apply_changelog": "q_cdc_apply",
    "chi2_feature_selection": "q_chi2_features",
    "coalesce_default": "q_coalesce",
    "collect_group_members": "q_collect_members",
    "conformal_interval_coverage": "q_conformal_interval",
    "contamination_ngram_overlap": "q_contamination",
    "correlated_subquery_above_avg": "q_correlated",
    "count_distinct_assets": "q_count_distinct",
    "cube_pricing": "q_cube",
    "dataset_split_hash": "q_dataset_split",
    "dedup_minhash_estimate": "q_minhash_estimate",
    "dedup_minhash_lsh": "q_dedup_minhash",
    "dedup_substring_spans": "q_substring_spans",
    "disjunctive_predicate_revenue": "q_disjunctive_revenue",
    "distinct_dedup": "q_distinct",
    "doc_chunking": "q_chunking",
    "drift_detect_states": "q_drift_states",
    "drift_set_difference": "q_drift_diff",
    "entity_resolution_fuzzy": "q_entity_resolution",
    "event_transition_matrix": "q_transition_matrix",
    "events_funnel": "q_funnel",
    "events_gaps_islands": "q_gaps_islands",
    "events_sliding_window": "q_events_sliding",
    "events_tumbling_window": "q_events_tumbling",
    "events_variant_semistructured": "q_events_variant",
    "graph_bfs_distances": "q_bfs",
    "graph_clustering_coefficient": "q_clustering_coefficient",
    "graph_connected_components": "q_components",
    "graph_hits_authorities": "q_hits_authorities",
    "graph_kcore": "q_kcore",
    "graph_label_propagation": "q_label_propagation",
    "graph_neighbor_jaccard": "q_neighbor_jaccard",
    "graph_pagerank": "q_pagerank",
    "graph_pagerank_personalized": "q_pagerank_personalized",
    "graph_shortest_path_weighted": "q_bellman",
    "graph_temporal_reachability": "q_temporal_reachability",
    "graph_triangle_count": "q_triangles",
    "grouping_sets_revenue": "q_grouping_sets",
    "higher_order_list_predicates": "q_higher_order",
    "idle_rich_customers": "q_idle_rich",
    "incremental_agg_maintenance": "q_incremental_maintenance",
    "incremental_join_maintenance": "q_incremental_join",
    "intersect_sets": "q_intersect",
    "interval_overlap_pairs": "q_interval_overlap",
    "join_null_safe": "q_null_safe",
    "json_extraction": "q_json_extract",
    "ks_drift_two_sample": "q_ks_drift",
    "lag_window_delta": "q_lag_window",
    "lang_temperature_weights": "q_temperature_weights",
    "layout_zorder": "q_zorder",
    "linear_trend_exact": "q_linear_trend",
    "list_fold_reduce": "q_list_fold",
    "list_membership_in": "q_isin",
    "logreg_train_exact": "q_logreg_train",
    "matchlink_edges": "q_matchlink",
    "median_value_by_type": "q_median",
    "minmax_stats": "q_minmax",
    "multihop_join_revenue": "q_multihop",
    "multimodal_audio_features": "q_multimodal_audio",
    "multimodal_decode_meta": "q_multimodal_decode",
    "multimodal_gif_decode": "q_multimodal_gif",
    "multimodal_jpeg_decode": "q_multimodal_jpeg",
    "multimodal_mjpeg_sample": "q_multimodal_mjpeg",
    "multimodal_png_decode": "q_multimodal_png",
    "multimodal_ulaw_audio": "q_multimodal_ulaw",
    "one_to_many_membership_join": "q_one_to_many_join",
    "optional_match_outer": "q_optional_match",
    "order_by_limit": "q_order_limit",
    "outlier_mad_robust": "q_outlier_mad",
    "outlier_zscore_exact": "q_outlier_zscore",
    "pattern_multihop_read": "q_pattern_multihop",
    "permission_wildcard_eval": "q_permission_eval",
    "pivot_status_by_priority": "q_pivot_status",
    "promo_parts_share": "q_promo_share",
    "psi_drift_binned": "q_psi_drift",
    "range_join_error_clicks": "q_range_join",
    "ratio_to_report_revenue": "q_ratio_to_report",
    "retention_cohorts": "q_retention",
    "rollup_continuous_aggregate": "q_rollup_continuous",
    "rule_compliance_counts": "q_rule_compliance",
    "sampling_kcenter_diverse": "q_kcenter_diverse",
    "scalar_datetime_functions": "q_scalar_datetime",
    "scalar_string_functions": "q_scalar_string",
    "sequence_packing": "q_packing",
    "similarity_ann_ivf": "q_similarity_ivf",
    "similarity_ann_lsh": "q_similarity_ann",
    "similarity_ann_multiprobe": "q_similarity_multiprobe",
    "similarity_cosine_topk": "q_similarity_topk",
    "similarity_int8_scan": "q_int8_scan",
    "similarity_ivf_pq": "q_ivf_pq",
    "similarity_pq_adc": "q_pq_adc",
    "similarity_token_cosine_pairs": "q_token_cosine_pairs",
    "sketch_countmin_heavy_hitters": "q_sketch_countmin",
    "sketch_hll_distinct": "q_sketch_hll",
    "sketch_hll_rollup_merge": "q_sketch_hll_rollup",
    "sketch_kmv_distinct": "q_sketch_kmv",
    "streaming_countmin_counts": "q_streaming_countmin",
    "supplier_wait_chain": "q_supplier_wait",
    "table_checksum_blocks": "q_table_checksum",
    "table_profile": "q_profile",
    "text_bigram_logprob": "q_bigram_logprob",
    "text_fingerprint": "q_fingerprint",
    "text_language_id": "q_language_id",
    "text_pii_scrub": "q_pii_scrub",
    "text_quality_score": "q_quality_score",
    "text_repetition_stats": "q_repetition",
    "text_token_stats": "q_token_stats",
    "text_unigram_logprob": "q_unigram_logprob",
    "text_vocab_growth": "q_vocab_growth",
    "tfidf_quantized": "q_tfidf",
    "throttle_dedup": "q_throttle",
    "timeseries_gap_fill": "q_gap_fill",
    "timeseries_time_weighted_avg": "q_twap",
    "top_supplied_parts_nested_in": "q_nested_in",
    "topk_per_group_salted": "q_topk_salted",
    "tpch_q10_returned_items": "q_tpch_q10",
    "tpch_q11_important_stock": "q_tpch_q11",
    "tpch_q12_late_shipment_priority": "q_tpch_q12",
    "tpch_q15_top_supplier": "q_tpch_q15",
    "tpch_q16_supplier_part_counts": "q_tpch_q16",
    "tpch_q17_small_qty_revenue": "q_tpch_q17",
    "tpch_q2_min_cost_offer": "q_tpch_q2",
    "tpch_q3_shipping_priority": "q_tpch_q3",
    "tpch_q5_local_supplier_revenue": "q_tpch_q5",
    "tpch_q6_forecast_revenue": "q_tpch_q6",
    "tpch_q7_volume_shipping": "q_tpch_q7",
    "tpch_q8_market_share": "q_tpch_q8",
    "tpch_q9_product_profit": "q_tpch_q9",
    "unigram_viterbi_segmentation": "q_unigram_viterbi",
    "union_dedup": "q_union",
    "unpivot_lineitem_metrics": "q_unpivot",
    "variable_length_closure": "q_varlen_closure",
    "window_ntile_quartiles": "q_ntile",
    "window_percent_rank": "q_percent_rank",
    "window_range_frame": "q_range_frame",
}


def test_builder_names_match_registration():
    specs = _ordered()
    bad = []
    for name, spec in specs.items():
        builder = spec.spark.__name__
        expect = KNOWN_ALIASES.get(name, f"q_{name}")
        if builder != expect:
            bad.append((name, builder, expect))
    assert not bad, (
        "registry entries whose builder does not match the canonical/frozen "
        f"name (decorator-stacking bug class): {bad}"
    )


def test_no_builder_registered_twice():
    specs = _ordered()
    by_fn = defaultdict(list)
    for name, spec in specs.items():
        by_fn[id(spec.spark)].append(name)
    dups = [names for names in by_fn.values() if len(names) > 1]
    assert not dups, f"one builder function registered under multiple names: {dups}"


def test_aliases_table_has_no_stale_entries():
    specs = _ordered()
    stale = [n for n in KNOWN_ALIASES if n not in specs]
    assert not stale, f"KNOWN_ALIASES rows for queries no longer registered: {stale}"


def test_oracles_none_or_nonempty_sql():
    specs = _ordered()
    bad = [n for n, s in specs.items() if s.oracle is not None and not s.oracle.strip()]
    assert not bad, f"empty-string oracles (should be real SQL or None): {bad}"
