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
# Round 13's window (committed at round start, per the checklist):
# the aged block whose latest driver row is r10 (age 3 at r13), as
# emitted by tools/rotate_window.py, with TWO in-place swaps of the
# r12 fold-swap pattern (each retiree was already mandatory in this
# window, so the subsuming query inherits its slot):
# incremental_agg_maintenance retires into changefeed_keyed_sync
# (VERDICT r12 task 2 — the retiree's writer-half recipe is embedded
# verbatim as the new query's maintained_agg branch, and the new
# query adds the keyed change-feed consumer half) and
# tablelog_manifest_stats retires into tablelog_restore_audit
# (task 7 stretch — same fixture and eight metadata-only aggregates,
# answered through a RESTORE commit). A TWO-SLOT rotation (retiring
# cdc_merge_apply, whose slot sits in r14's aged block, and
# displacing scd2_user_state into it) was considered and REJECTED:
# the displaced query's r10 evidence reaches age 4 the moment
# CORRECTNESS_r13 lands, turning tests/test_rotation_policy.py red
# in the end-of-round judge run — in-place subsumption is the ONLY
# slot-legal way a new query enters at the 150 cap. Net ages stay
# <= 3 for every query.
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
    "ann_ivf_probe_topk",  # r10
    "ann_recall_at_k",  # r10
    "asof_last_click_before_purchase",  # r10
    "bm25_topk",  # r10
    "coercion_null_on_error",  # r10
    "conditional_counts",  # r10
    "corpus_build_manifest",  # r10
    "customers_without_urgent_orders",  # r10
    "dataset_split_assignment",  # r10
    "decontaminate_ngram_overlap",  # r10
    "dedup_cascade_keep_list",  # r10
    "dedup_exact_content",  # r10
    "dedup_user_event_type",  # r10
    "deterministic_doc_sample",  # r10
    "doc_language_id",  # r10
    "dominant_event_type",  # r10
    "event_type_share",  # r10
    "global_stats",  # r10
    "hll_distinct_sketch",  # r10
    # NEW r13 (slot inherited in place: changefeed_keyed_sync
    # strictly subsumes the retired incremental_agg_maintenance,
    # which was already mandatory in this window — its recipe is
    # embedded verbatim as the maintained_agg branch; subsumption
    # note in plans/tablelog_queries.py)
    "changefeed_keyed_sync",
    "knn_cosine_topk",  # r10
    "latest_event_per_user",  # r10
    "multimodal_decode_gif",  # r10
    "multimodal_feature_extract",  # r10
    "nations_sorted",  # r10
    "near_dup_clusters",  # r10
    "near_dup_pairs_minhash",  # r10
    "null_drop_critical",  # r10
    "order_date_arithmetic",  # r10
    "pack_explode_flatten",  # r10
    "pagerank_trade_graph",  # r10
    "parse_props_json",  # r10
    "pivot_status_qty",  # r10
    "pricing_summary",  # r10
    "promo_revenue_ratio",  # r10
    "range_validity_flags",  # r10
    "recent_events_feed",  # r10
    "regional_revenue",  # r10
    "rollup_returnflag_status",  # r10
    "scd2_user_state",  # r10
    "sequence_pack_assignment",  # r10
    # NEW r13 (slot inherited in place: tablelog_restore_audit
    # strictly subsumes the retired tablelog_manifest_stats, which
    # was already mandatory in this window — subsumption note in
    # plans/tablelog_queries.py)
    "tablelog_restore_audit",
    "tfidf_top_terms",  # r10
    "top_revenue_orders",  # r10
    "tumbling_hourly_by_type",  # r10
    "union_segments",  # r10
    "user_activity_coverage",  # r10
    "user_session_windows",  # r10
    "validation_aggregates",  # r10
    "weather_current_status",  # r10
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
