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
# row first. All queries stay continuously oracle-checked by
# tests/test_catalog_oracle.py regardless of window position.
# ROUND-START CHECKLIST: run `python tools/rotate_window.py`, paste
# the emitted tuple here (adjusting only the free-slot choices), and
# re-run `pytest tests/test_rotation_policy.py` — r07 skipped this
# step and burned the round's 50 driver slots re-checking green rows.
#
# Round 8's window (committed BEFORE the r08 driver run — the r07
# window was never rotated, so r07 burned its slots re-checking the
# r06 list and left TWO stale generations): multimodal_decode_jpeg
# (NEW in r07, never driver-checked), the 48 queries whose latest
# driver row is r04 (age 4 at r08 — already past the limit), and
# cdc_merge_apply (NEW this round) in the one remaining slot. The
# 49-query r05-latest block cannot also fit; it reaches age 4 at r09
# and MUST be round 9's window (49 mandatory + 1 free slot). That is
# the catch-up schedule for the r07 miss — one generation per round
# is all a 50-slot window can refresh.
#
# Capacity ledger: the sustainability test caps the catalog at
# 50 * MAX_AGE_ROUNDS = 150 queries. cdc_merge_apply makes 149.
# misra_gries_heavy_hitters and bpe_train_merges are implemented and
# pytest/oracle-tested this round (plans/sketch.py, plans/corpus.py)
# but CANNOT be registered yet — registration requires a window slot
# at creation time and r08 has exactly one. Plan of record: r09
# registers both by (a) taking the free slot and (b) replacing
# bpe_merge_candidates (an r05-block query whose one-round plan
# bpe_train_merges strictly subsumes), which keeps N at 150 and the
# r09 window at 48 + 2 new = 50. At N=150 every later window is
# exactly its mandatory block — ZERO slack — so the standing protocol
# for any future schema/semantics change is: retire (or subsume) one
# query in the SAME commit, swapping its window slot to the changed
# query; never grow past 150 and never let a changed query ride on
# stale driver evidence.
DRIVER_WINDOW = (
    # --- NEW in r07, never driver-checked: first in line ---
    "multimodal_decode_jpeg",
    # --- the 48 queries whose latest driver row is r04 ---
    # composite multi-stage plans first (most likely to regress),
    # then the relational/window block, text block, sampling block.
    "kmeans_lloyd_assignments",
    "dedup_incremental_near",
    "dedup_incremental_batch",
    "interval_range_join_counts",
    "near_dup_pairs_ngram",
    "near_dup_pairs_editdist",
    "near_dup_pairs_simhash",
    "near_dup_pairs_embedding",
    "ann_hyperplane_lsh_topk",
    "label_centroids",
    "minhash_signatures",
    "bloom_dedup_probe",
    "cms_user_activity_sketch",
    "doc_importance_weights",
    "doc_bigram_lm_score",
    "doc_duplicated_spans",
    "doc_repetition_metrics",
    "doc_fingerprints",
    "doc_simhash",
    "doc_token_stats",
    "doc_quality_scores",
    "doc_stopword_filtered",
    "doc_chunk_tokens",
    "term_frequencies",
    "pii_redaction",
    "multimodal_payload_stats",
    "multimodal_decode_ppm",
    "multimodal_frame_sample",
    "multimodal_distinct_bytes",
    "corpus_mixture_sample",
    "stratified_sample_per_lang",
    "top3_events_per_user",
    "event_gaps_lag",
    "user_running_totals",
    "event_rank_functions",
    "gap_based_sessions",
    "grouping_sets_pricing",
    "customers_with_high_value_orders",
    "date_range_revenue",
    "union_distinct_active_users",
    "cube_type_user_bucket",
    "intersect_error_purchase_users",
    "except_users_without_big_events",
    "events_table_profile",
    "referential_integrity_audit",
    "sliding_hourly_activity",
    "daily_value_rollup",
    "trailing_hour_user_stats",
    # --- NEW this round (the one free slot) ---
    "cdc_merge_apply",
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
