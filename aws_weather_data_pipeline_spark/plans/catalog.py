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
# entries, so ordering is coverage policy, not cosmetics. Rotation
# plan (VERDICT r03 #2/#8): round 4's window = the 38 queries that
# have never had a driver row (32 catalog residents + the six new
# round-4 operators: PPM decode, bigram LM, DSIR weights, duplicated
# spans, incremental near-dup, trailing-hour range frame) plus 12 of
# the 17 whose only driver row was round 2, prioritizing the full
# window/rank/set-op family (the five r02-green singles left out —
# fixed_size_doc_sample, value_histogram, lineitem_unpivot_measures,
# small_quantity_order_revenue, price_percentiles_by_flag — cycle
# back in round 5). The 50 queries checked green in round 3 rotate
# out; after this round every catalog query has a driver row from
# round 2, 3, or 4. All 105 stay continuously oracle-checked by
# tests/test_catalog_oracle.py regardless of window position.
DRIVER_WINDOW = (
    # --- never driver-checked (rounds 1-3) ---
    "events_table_profile",
    "referential_integrity_audit",
    "sliding_hourly_activity",
    "daily_value_rollup",
    "interval_range_join_counts",
    "doc_token_stats",
    "term_frequencies",
    "doc_quality_scores",
    "doc_fingerprints",
    "doc_simhash",
    "pii_redaction",
    "doc_repetition_metrics",
    "cms_user_activity_sketch",
    "bloom_dedup_probe",
    "kmeans_lloyd_assignments",
    "minhash_signatures",
    "near_dup_pairs_editdist",
    "near_dup_pairs_simhash",
    "near_dup_pairs_ngram",
    "near_dup_pairs_embedding",
    "ann_hyperplane_lsh_topk",
    "dedup_cascade_keep_list",
    "label_centroids",
    "dedup_incremental_batch",
    "multimodal_payload_stats",
    "multimodal_frame_sample",
    "multimodal_distinct_bytes",
    "multimodal_decode_ppm",
    "doc_bigram_lm_score",
    "doc_importance_weights",
    "doc_duplicated_spans",
    "dedup_incremental_near",
    "trailing_hour_user_stats",
    "corpus_mixture_sample",
    "doc_stopword_filtered",
    "doc_chunk_tokens",
    "stratified_sample_per_lang",
    "sequence_pack_assignment",
    # --- r02-only driver rows: window/rank/set-op family cycling back ---
    "top3_events_per_user",
    "event_gaps_lag",
    "user_running_totals",
    "event_rank_functions",
    "gap_based_sessions",
    "union_distinct_active_users",
    "intersect_error_purchase_users",
    "except_users_without_big_events",
    "date_range_revenue",
    "cube_type_user_bucket",
    "grouping_sets_pricing",
    "customers_with_high_value_orders",
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
