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
    "graph",
)

# The driver's correctness harness checks only the FIRST 50 catalog
# entries, so ordering is coverage policy, not cosmetics. Rotation
# policy (executable form: tests/test_rotation_policy.py fails if any
# query's driver evidence would exceed 3 rounds old under this
# committed window): every round's window = (a) queries NEW this
# round, (b) queries whose SCHEMA or semantics changed this round
# even if recently green (their old driver rows no longer describe
# the current shape), then (c) the stalest remainder, oldest driver
# row first. Round 6's window = the 43 queries whose latest driver
# row is r03 (they would hit the 3-round limit this round), the new
# four queries NEW this round (multimodal_decode_gif, scd2_user_state,
# ann_recall_at_k, pagerank_trade_graph), the two queries whose OUTPUT
# SCHEMA changed with the r05 ADVICE fixes (sequence_pack_assignment
# and corpus_build_manifest emit (shard, pack_index) instead of an
# encoded pack_id — their green r05 rows describe the old shape;
# value_outliers_exact and exact_substr_removal also changed but only
# internally, same output contract, so their r05 rows stand), and one
# r04 fill (dedup_cascade_keep_list, the most composite r04 plan).
# The remaining 48 r04-latest queries head round 7's window (they hit
# age 3 there); the r05-latest block fills round 8. All queries stay
# continuously oracle-checked by tests/test_catalog_oracle.py
# regardless of window position.
DRIVER_WINDOW = (
    # --- NEW this round: must be driver-checked at creation time ---
    "multimodal_decode_gif",
    "scd2_user_state",
    "ann_recall_at_k",
    "pagerank_trade_graph",
    # --- output schema changed this round (r05 ADVICE fixes):
    # --- re-evidence the new shapes even though their rows are green
    "sequence_pack_assignment",
    "corpus_build_manifest",
    # --- the 43 queries whose latest driver row is r03 ---
    "ann_ivf_probe_topk",
    "asof_last_click_before_purchase",
    "bm25_topk",
    "coercion_null_on_error",
    "conditional_counts",
    "customers_without_urgent_orders",
    "dataset_split_assignment",
    "decontaminate_ngram_overlap",
    "dedup_exact_content",
    "dedup_user_event_type",
    "deterministic_doc_sample",
    "doc_language_id",
    "dominant_event_type",
    "event_type_share",
    "filter_isin_projection",
    "global_stats",
    "hll_distinct_sketch",
    "knn_cosine_topk",
    "latest_event_per_user",
    "multimodal_feature_extract",
    "nations_sorted",
    "near_dup_clusters",
    "near_dup_pairs_minhash",
    "null_drop_critical",
    "order_date_arithmetic",
    "pack_explode_flatten",
    "parse_props_json",
    "pivot_status_qty",
    "pricing_summary",
    "promo_revenue_ratio",
    "range_validity_flags",
    "recent_events_feed",
    "regional_revenue",
    "rollup_returnflag_status",
    "tfidf_top_terms",
    "top10_orders_by_price",
    "top_revenue_orders",
    "tumbling_hourly_by_type",
    "union_segments",
    "user_activity_coverage",
    "user_session_windows",
    "validation_aggregates",
    "weather_current_status",
    # --- r04 fill (the most composite r04 plan) ---
    "dedup_cascade_keep_list",
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
