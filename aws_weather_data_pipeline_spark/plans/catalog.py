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
# Round 14's window (committed at round start, per the checklist):
# the aged block whose latest driver row is r11 (age 3 at r14),
# exactly as emitted by tools/rotate_window.py — no swaps this
# round: the surface is complete against SURVEY §2 and the VERDICT
# r13 directive is to spend builder-time on the streaming→tablelog
# seam, bench-harness truth, and fixture economy, not breadth, so
# no new query enters and no retirement is needed. Net ages stay
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
    "ann_hyperplane_lsh_topk",  # r11
    "bloom_dedup_probe",  # r11
    "cdc_merge_apply",  # r11
    "cms_user_activity_sketch",  # r11
    "corpus_mixture_sample",  # r11
    "cube_type_user_bucket",  # r11
    "customers_with_high_value_orders",  # r11
    "daily_value_rollup",  # r11
    "date_range_revenue",  # r11
    "dedup_incremental_batch",  # r11
    "dedup_incremental_near",  # r11
    "doc_bigram_lm_score",  # r11
    "doc_chunk_tokens",  # r11
    "doc_duplicated_spans",  # r11
    "doc_fingerprints",  # r11
    "doc_importance_weights",  # r11
    "doc_quality_scores",  # r11
    "doc_repetition_metrics",  # r11
    "doc_simhash",  # r11
    "doc_stopword_filtered",  # r11
    "doc_token_stats",  # r11
    "event_gaps_lag",  # r11
    "event_rank_functions",  # r11
    "events_table_profile",  # r11
    "except_users_without_big_events",  # r11
    "gap_based_sessions",  # r11
    "grouping_sets_pricing",  # r11
    "intersect_error_purchase_users",  # r11
    "interval_range_join_counts",  # r11
    "kmeans_lloyd_assignments",  # r11
    "label_centroids",  # r11
    "minhash_signatures",  # r11
    "multimodal_decode_avi",  # r11
    "multimodal_decode_jpeg",  # r11
    "multimodal_decode_ppm",  # r11
    "multimodal_distinct_bytes",  # r11
    "multimodal_payload_stats",  # r11
    "near_dup_pairs_editdist",  # r11
    "near_dup_pairs_embedding",  # r11
    "near_dup_pairs_ngram",  # r11
    "near_dup_pairs_simhash",  # r11
    "pii_redaction",  # r11
    "referential_integrity_audit",  # r11
    "sliding_hourly_activity",  # r11
    "stratified_sample_per_lang",  # r11
    "tablelog_nullcount_prune",  # r11
    "term_frequencies",  # r11
    "top3_events_per_user",  # r11
    "trailing_hour_user_stats",  # r11
    "user_running_totals",  # r11
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
