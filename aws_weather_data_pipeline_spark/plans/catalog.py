"""Top-level query catalog: merges every operator module's registry.

``__spark_entry__`` consumes this; tests replay the same comparisons.
"""

from __future__ import annotations

import importlib
import importlib.util

from .registry import QueryCatalog

# Every operator module that contributes catalog queries. A module listed
# here but absent on disk is skipped (feature not built yet); a module
# that EXISTS but fails to import raises — a typo inside an operator
# module must never silently shrink driver coverage.
OPERATOR_MODULES = (
    "weatherlike",
    "temporal",
    "text",
    "corpus",
    "sketch",
    "clustering",
    "similarity",
    "multimodal",
    "sampling",
    "streaming_equiv",
    "layout",
)

# The driver's correctness harness checks only the FIRST 50 catalog
# entries, so ordering is coverage policy, not cosmetics. Rotation
# plan (VERDICT r04 #1): round 5's window = the 2 queries added after
# round 4's window froze (multimodal_resize_stats, split_leakage_audit
# — never driver-checked), the 5 whose only driver row is round 2
# (fixed_size_doc_sample, value_histogram, lineitem_unpivot_measures,
# small_quantity_order_revenue, price_percentiles_by_flag), any query
# NEW this round (inserted here at creation time), then as many of the
# 50 r03-green queries as fit — weather / near-dup / sketch families
# first — so no driver evidence goes stale beyond 2 rounds. The
# twenty-five r03-green singles that didn't fit (nations_sorted,
# recent_events_feed, top10_orders_by_price, filter_isin_projection,
# order_date_arithmetic, coercion_null_on_error, null_drop_critical,
# range_validity_flags, promo_revenue_ratio, dedup_user_event_type,
# validation_aggregates, union_segments, user_activity_coverage,
# regional_revenue, latest_event_per_user, top_revenue_orders,
# customers_without_urgent_orders, pivot_status_qty,
# rollup_returnflag_status, event_type_share, dominant_event_type,
# global_stats, conditional_counts, asof_last_click_before_purchase,
# tumbling_hourly_by_type, pricing_summary, dataset_split_assignment,
# user_session_windows, deterministic_doc_sample, bm25_topk,
# multimodal_feature_extract, tfidf_top_terms, doc_language_id,
# hll_distinct_sketch, ann_ivf_probe_topk, decontaminate_ngram_overlap,
# knn_cosine_topk, near_dup_clusters, near_dup_pairs_minhash (its
# pipeline still driver-runs inside leakage_safe_split_assignment and
# corpus_build_manifest), dedup_exact_content, pack_explode_flatten,
# parse_props_json, weather_current_status — popped to make room for
# this round's new queries) head round 6's window together with the
# round-4 block. All queries stay continuously oracle-checked by
# tests/test_catalog_oracle.py regardless of window position.
DRIVER_WINDOW = (
    # --- never driver-checked (added after the r04 window froze) ---
    "multimodal_resize_stats",
    "split_leakage_audit",
    # --- r02-only driver rows cycling back (stale >2 rounds) ---
    "fixed_size_doc_sample",
    "value_histogram",
    "lineitem_unpivot_measures",
    "small_quantity_order_revenue",
    "price_percentiles_by_flag",
    # --- NEW this round: must be driver-checked at creation time ---
    "multimodal_decode_png",
    "multimodal_decode_wav",
    "streaming_batch_equivalence",
    "streaming_windowed_alert_counts",
    "split_leakage_audit_simhash",
    "doc_winnowing_fingerprints",
    "near_dup_pairs_winnow",
    "quantile_sketch_estimates",
    "semantic_dedup_keep_list",
    "zorder_layout_audit",
    "corpus_filter_funnel",
    "streaming_running_user_stats",
    "streaming_attributed_purchases",
    "streaming_dedup_replay",
    "length_weighted_doc_sample",
    "corpus_relative_quality_filter",
    "salted_hot_key_join",
    "salted_user_event_lists",
    "exact_substr_removal",
    "hard_negative_mining",
    "temperature_mixture_sample",
    "streaming_session_windows",
    "pq_code_assignment",
    "pq_adc_topk",
    "streaming_static_enrichment",
    "value_outliers_exact",
    "ivf_pq_search_topk",
    "ann_multiprobe_lsh_topk",
    "doc_simpson_diversity",
    "leakage_safe_split_assignment",
    "bpe_merge_candidates",
    "streaming_attribution_with_timeouts",
    "multimodal_audio_windows",
    "corpus_build_manifest",
    "multimodal_image_tiles",
    "dedup_attrition_by_source",
    # --- r03-green core recycling: weather family ---
    "weather_conversions",
    "weather_comfort_heat_index",
    "weather_severity_class",
    "weather_alert_feed",
    "weather_time_features",
    "weather_quality_flags",
    "weather_daily_summary",
)


def build_catalog() -> QueryCatalog:
    from . import relational

    cat = QueryCatalog()
    cat.merge(relational.CATALOG)
    for modname in OPERATOR_MODULES:
        if importlib.util.find_spec(f".{modname}", __package__) is None:
            continue
        mod = importlib.import_module(f".{modname}", __package__)
        cat.merge(mod.CATALOG)

    missing = [n for n in DRIVER_WINDOW if n not in cat.queries]
    if missing:
        raise ValueError(f"DRIVER_WINDOW names unknown queries: {missing}")
    ordered = QueryCatalog()
    ordered.queries = {n: cat.queries[n] for n in DRIVER_WINDOW}
    for name, q in cat.queries.items():
        if name not in ordered.queries:
            ordered.queries[name] = q
    return ordered
