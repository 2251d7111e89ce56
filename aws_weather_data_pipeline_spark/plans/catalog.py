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
    "tablelog_queries",
)

# The driver's correctness harness checks only the FIRST 50 catalog
# entries, so ordering is coverage policy, not cosmetics. Rotation
# policy (executable form: tests/test_rotation_policy.py fails if any
# query's driver evidence would exceed 3 rounds old under this
# committed window): every round's window = (a) queries NEW this
# round, (b) queries whose SCHEMA or semantics changed this round
# even if recently green (their old driver rows no longer describe
# the current shape), then (c) the stalest remainder, oldest driver
# row first. All queries stay continuously oracle-checked by
# tests/test_catalog_oracle.py regardless of window position.
# ROUND-START CHECKLIST: run `python tools/rotate_window.py`, paste
# the emitted tuple here (adjusting only the free-slot choices), and
# re-run `pytest tests/test_rotation_policy.py` — r07 skipped this
# step and burned the round's 50 driver slots re-checking green rows.
#
# Round 16's window (committed at round start, per the checklist):
# the aged block whose latest driver row is r13 (age 3 at r16) —
# the relational/weatherlike core (pricing_summary,
# weather_current_status, pack_explode_flatten, joins/set-ops),
# changefeed_keyed_sync, tablelog_restore_audit,
# corpus_build_manifest, pagerank_trade_graph, multimodal_decode_gif,
# dedup_cascade_keep_list, … — exactly as emitted by
# tools/rotate_window.py, no swaps: the surface is complete against
# SURVEY §2 and the VERDICT r15 directive spends builder time on
# making the measured scale-safe shapes the library defaults
# (SemDeDup k≈√n, MinHash max_bucket guidance) plus the ADVICE r15
# tablelog migration fixes, not breadth, so no new query enters and
# no retirement is needed. Net ages stay <= 3 for every query.
#
# Capacity ledger: the sustainability test caps the catalog at
# 50 * MAX_AGE_ROUNDS = 150 queries. Every round since r09 ends AT
# the cap (r12: 50 r10-latest + 50 r11-latest + the 50 in this
# window). At N=150 every round's window is exactly its mandatory
# aged block — ZERO slack — so the standing protocol for any new
# query or schema/semantics change is: retire (or subsume) one query
# in the SAME commit, swapping its window slot to the new/changed
# query; never grow past 150 and never let a changed query ride on
# stale driver evidence. Swap history: r10 retired
# top10_orders_by_price → incremental_agg_maintenance and
# filter_isin_projection → tablelog_manifest_stats (subsumption
# arguments in those modules); r11 retired multimodal_frame_sample →
# multimodal_decode_avi and union_distinct_active_users →
# tablelog_nullcount_prune (subsumption arguments in those modules);
# r12 retired multimodal_decode_wav → multimodal_decode_flac (above)
# and tablelog_time_travel_prune → tablelog_checkpoint_fold (strict
# subsumption IN PLACE — the retiree was already mandatory in this
# window, so the fold query inherits its slot: same time-travel +
# zone-map-prune recipe exercised through a vacuumed, checkpoint-
# folded log plus a fold-answered txn replay; note in
# plans/tablelog_queries.py); r13 retired incremental_agg_maintenance
# → changefeed_keyed_sync and tablelog_manifest_stats →
# tablelog_restore_audit (both strict subsumptions IN PLACE, the r12
# fold-swap pattern — header note above; subsumption notes in
# plans/tablelog_queries.py).
DRIVER_WINDOW = (
    "ann_ivf_probe_topk",  # r13
    "ann_recall_at_k",  # r13
    "asof_last_click_before_purchase",  # r13
    "bm25_topk",  # r13
    "changefeed_keyed_sync",  # r13
    "coercion_null_on_error",  # r13
    "conditional_counts",  # r13
    "corpus_build_manifest",  # r13
    "customers_without_urgent_orders",  # r13
    "dataset_split_assignment",  # r13
    "decontaminate_ngram_overlap",  # r13
    "dedup_cascade_keep_list",  # r13
    "dedup_exact_content",  # r13
    "dedup_user_event_type",  # r13
    "deterministic_doc_sample",  # r13
    "doc_language_id",  # r13
    "dominant_event_type",  # r13
    "event_type_share",  # r13
    "global_stats",  # r13
    "hll_distinct_sketch",  # r13
    "knn_cosine_topk",  # r13
    "latest_event_per_user",  # r13
    "multimodal_decode_gif",  # r13
    "multimodal_feature_extract",  # r13
    "nations_sorted",  # r13
    "near_dup_clusters",  # r13
    "near_dup_pairs_minhash",  # r13
    "null_drop_critical",  # r13
    "order_date_arithmetic",  # r13
    "pack_explode_flatten",  # r13
    "pagerank_trade_graph",  # r13
    "parse_props_json",  # r13
    "pivot_status_qty",  # r13
    "pricing_summary",  # r13
    "promo_revenue_ratio",  # r13
    "range_validity_flags",  # r13
    "recent_events_feed",  # r13
    "regional_revenue",  # r13
    "rollup_returnflag_status",  # r13
    "scd2_user_state",  # r13
    "sequence_pack_assignment",  # r13
    "tablelog_restore_audit",  # r13
    "tfidf_top_terms",  # r13
    "top_revenue_orders",  # r13
    "tumbling_hourly_by_type",  # r13
    "union_segments",  # r13
    "user_activity_coverage",  # r13
    "user_session_windows",  # r13
    "validation_aggregates",  # r13
    "weather_current_status",  # r13
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
