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
# Round 11's window (committed at round start, per the checklist):
# the 3-round cycle's second full turn — the 48 surviving queries
# whose latest driver row is r08 (age 3 at r11; 50 were r08-latest,
# two retired this round), plus TWO new queries in the retirees'
# slots: r10's committed plan of record executed first-commit, a
# second zero-slack swap mid-round. Swap 1:
# multimodal_frame_sample retired (its fixed-byte-window
# slicing was its own doc's "ffmpeg-keyframe stand-in"; decode_avi
# strictly subsumes it — identical Arrow row-expansion + stride
# sampling + SQL-md5 contract, over REAL RIFF container frames),
# slot transferred to multimodal_decode_avi, whose fixture mixes
# uncompressed-DIB and motion-JPEG streams per the r10 VERDICT so
# the driver row certifies BOTH codec dispatch paths
# (plans/multimodal.py AVI_FRAMES_SQL;
# functions/multimodal.with_avi_payload). Swap 2:
# union_distinct_active_users retired (subsumption argument in
# plans/relational.py), slot transferred to tablelog_nullcount_prune
# (the __nulls file-skip driver row, VERDICT r10 task 4).
# tools/rotate_window.py emitted the rotation tuple (never-checked
# block first, then the aged-r08 block, zero free slots beyond the
# two swaps).
#
# Capacity ledger: the sustainability test caps the catalog at
# 50 * MAX_AGE_ROUNDS = 150 queries. Every round since r09 ends AT
# the cap (r11: 50 r09-latest + 50 r10-latest + the 50 in this
# window). At N=150 every round's window is exactly its mandatory
# aged block — ZERO slack — so the standing protocol for any new
# query or schema/semantics change is: retire (or subsume) one query
# in the SAME commit, swapping its window slot to the new/changed
# query; never grow past 150 and never let a changed query ride on
# stale driver evidence. Swap history: r10 retired
# top10_orders_by_price → incremental_agg_maintenance and
# filter_isin_projection → tablelog_manifest_stats (subsumption
# arguments in those modules); r11 retired multimodal_frame_sample →
# multimodal_decode_avi (above) and union_distinct_active_users →
# tablelog_nullcount_prune (the __nulls file-skip driver row;
# subsumption argument in plans/relational.py).
DRIVER_WINDOW = (
    # NEW r11, never driver-checked (slot from the retired
    # multimodal_frame_sample per the zero-slack swap protocol;
    # plans/multimodal.py AVI_FRAMES_SQL)
    "multimodal_decode_avi",
    # --- the aged block: latest driver row r08 (48 survivors,
    # plus tablelog_nullcount_prune spliced into the retired
    # union_distinct_active_users' slot below) ---
    "ann_hyperplane_lsh_topk",
    "bloom_dedup_probe",
    "cdc_merge_apply",
    "cms_user_activity_sketch",
    "corpus_mixture_sample",
    "cube_type_user_bucket",
    "customers_with_high_value_orders",
    "daily_value_rollup",
    "date_range_revenue",
    "dedup_incremental_batch",
    "dedup_incremental_near",
    "doc_bigram_lm_score",
    "doc_chunk_tokens",
    "doc_duplicated_spans",
    "doc_fingerprints",
    "doc_importance_weights",
    "doc_quality_scores",
    "doc_repetition_metrics",
    "doc_simhash",
    "doc_stopword_filtered",
    "doc_token_stats",
    "event_gaps_lag",
    "event_rank_functions",
    "events_table_profile",
    "except_users_without_big_events",
    "gap_based_sessions",
    "grouping_sets_pricing",
    "intersect_error_purchase_users",
    "interval_range_join_counts",
    "kmeans_lloyd_assignments",
    "label_centroids",
    "minhash_signatures",
    "multimodal_decode_jpeg",
    "multimodal_decode_ppm",
    "multimodal_distinct_bytes",
    "multimodal_payload_stats",
    "near_dup_pairs_editdist",
    "near_dup_pairs_embedding",
    "near_dup_pairs_ngram",
    "near_dup_pairs_simhash",
    "pii_redaction",
    "referential_integrity_audit",
    "sliding_hourly_activity",
    "stratified_sample_per_lang",
    "term_frequencies",
    "top3_events_per_user",
    "trailing_hour_user_stats",
    # NEW r11, never driver-checked (slot from the retired
    # union_distinct_active_users per the zero-slack swap protocol;
    # subsumption argument in plans/relational.py — the __nulls
    # pruning driver row, VERDICT r10 task 4)
    "tablelog_nullcount_prune",
    "user_running_totals",
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
