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
)

# The driver's correctness harness checks only the FIRST 50 catalog
# entries, so ordering is coverage policy, not cosmetics. This window
# pins one driver-checked query for every SURVEY §2 operator plus a
# flagship per LLM-pipeline family (temporal windows, text analysis,
# dedup/near-dup, ANN, multimodal, sampling). Queries past the window
# are redundant variants of an operator already covered here — they
# stay fully oracle-checked by tests/test_catalog_oracle.py.
DRIVER_WINDOW = (
    # Relational core (A/W/O/U/P/J operators)
    "pricing_summary",
    "global_stats",
    "conditional_counts",
    "dominant_event_type",
    "event_type_share",
    "rollup_returnflag_status",
    "pivot_status_qty",
    "dedup_user_event_type",
    "latest_event_per_user",
    "order_date_arithmetic",
    "top_revenue_orders",
    "regional_revenue",
    "customers_without_urgent_orders",
    "filter_isin_projection",
    "range_validity_flags",
    "user_activity_coverage",
    "union_segments",
    "top10_orders_by_price",
    "recent_events_feed",
    "nations_sorted",
    "validation_aggregates",
    "coercion_null_on_error",
    "null_drop_critical",
    "promo_revenue_ratio",
    # Weather domain (F1-F16)
    "weather_conversions",
    "weather_comfort_heat_index",
    "weather_severity_class",
    "weather_alert_feed",
    "weather_time_features",
    "weather_quality_flags",
    "weather_daily_summary",
    "weather_current_status",
    # Nested ingest (P1-P3)
    "parse_props_json",
    "pack_explode_flatten",
    # Temporal windows + as-of join
    "tumbling_hourly_by_type",
    "user_session_windows",
    "asof_last_click_before_purchase",
    # Text analysis + corpus curation (repetition gates stay past the
    # window: the text family is already represented twice here)
    "tfidf_top_terms",
    "doc_language_id",
    "decontaminate_ngram_overlap",
    "bm25_topk",
    # Mergeable sketches
    "hll_distinct_sketch",
    # Dedup / near-dup / clustering
    "dedup_exact_content",
    "near_dup_pairs_minhash",
    "near_dup_clusters",
    # Similarity search
    "knn_cosine_topk",
    "ann_ivf_probe_topk",
    # Multimodal
    "multimodal_feature_extract",
    # Sampling / splits
    "deterministic_doc_sample",
    "dataset_split_assignment",
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
