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
# Round 9's window (committed at round start, per the checklist):
# the 47 remaining queries whose latest driver row is r05 (age 4 at
# r09 — the second half of the r07-miss catch-up; round 8 refreshed
# the r04 generation), plus three NEW registrations, each slotted by
# the zero-slack swap protocol: bpe_train_merges takes the window
# slot of the retired bpe_merge_candidates (an r05-block query whose
# single round the trainer strictly subsumes — round 1 of the merge
# table IS its top pair, pinned by tests/test_bpe.py);
# mg_heavy_hitter_pairs takes the one free slot (r08's committed
# plan of record); tablelog_time_travel_prune takes the slot of the
# retired split_leakage_audit_simhash (a one-line composition of
# split_leakage_audit's aggregation and near_dup_pairs_simhash's
# pairs, both independently driver-checked). 47 + 3 = 50.
#
# Capacity ledger: the sustainability test caps the catalog at
# 50 * MAX_AGE_ROUNDS = 150 queries. r08 ended at 149; r09 retires
# bpe_merge_candidates and split_leakage_audit_simhash (-2) and
# registers bpe_train_merges, mg_heavy_hitter_pairs, and
# tablelog_time_travel_prune (+3) → N = 150, the cap. At N=150 every
# later window is exactly its mandatory block — ZERO slack — so the
# standing protocol for any future schema/semantics change is: retire
# (or subsume) one query in the SAME commit, swapping its window slot
# to the changed query; never grow past 150 and never let a changed
# query ride on stale driver evidence. After r09 the catch-up debt is
# cleared: every query's latest row will be r07/r08/r09 and the
# steady-state 3-round cycle (r10 re-checks the r07 generation, …)
# resumes.
DRIVER_WINDOW = (
    # --- NEW in r09, never driver-checked: first in line ---
    "bpe_train_merges",
    "mg_heavy_hitter_pairs",
    "tablelog_time_travel_prune",
    # --- the 47 queries whose latest driver row is r05 ---
    # composite multi-stage plans first (most likely to regress),
    # then streaming, weather, sampling/relational blocks.
    "semantic_dedup_keep_list",
    "corpus_filter_funnel",
    "corpus_relative_quality_filter",
    "exact_substr_removal",
    "dedup_attrition_by_source",
    "near_dup_pairs_winnow",
    "hard_negative_mining",
    "split_leakage_audit",
    "leakage_safe_split_assignment",
    "ann_multiprobe_lsh_topk",
    "pq_code_assignment",
    "pq_adc_topk",
    "ivf_pq_search_topk",
    "doc_winnowing_fingerprints",
    "doc_simpson_diversity",
    "quantile_sketch_estimates",
    "multimodal_image_tiles",
    "multimodal_decode_png",
    "multimodal_decode_wav",
    "multimodal_audio_windows",
    "multimodal_resize_stats",
    "streaming_batch_equivalence",
    "streaming_windowed_alert_counts",
    "streaming_running_user_stats",
    "streaming_session_windows",
    "streaming_attributed_purchases",
    "streaming_static_enrichment",
    "streaming_attribution_with_timeouts",
    "streaming_dedup_replay",
    "weather_conversions",
    "weather_comfort_heat_index",
    "weather_severity_class",
    "weather_alert_feed",
    "weather_time_features",
    "weather_quality_flags",
    "weather_daily_summary",
    "temperature_mixture_sample",
    "length_weighted_doc_sample",
    "fixed_size_doc_sample",
    "salted_hot_key_join",
    "salted_user_event_lists",
    "value_histogram",
    "value_outliers_exact",
    "small_quantity_order_revenue",
    "lineitem_unpivot_measures",
    "price_percentiles_by_flag",
    "zorder_layout_audit",
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
