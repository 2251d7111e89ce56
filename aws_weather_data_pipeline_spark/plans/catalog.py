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
# Round 15's window (committed at round start, per the checklist):
# the aged block whose latest driver row is r12 (age 3 at r15) —
# the weather family, the streaming family, sketches, BPE, SemDeDup,
# zorder_layout_audit, tablelog_checkpoint_fold — exactly as emitted
# by tools/rotate_window.py, no swaps: the surface is complete
# against SURVEY §2 and the VERDICT r14 directive spends builder
# time on measured scale-probe evidence and the keyed fan-in model
# machine, not breadth, so no new query enters and no retirement is
# needed. Net ages stay <= 3 for every query.
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
    "ann_multiprobe_lsh_topk",  # r12
    "bpe_train_merges",  # r12
    "corpus_filter_funnel",  # r12
    "corpus_relative_quality_filter",  # r12
    "dedup_attrition_by_source",  # r12
    "doc_simpson_diversity",  # r12
    "doc_winnowing_fingerprints",  # r12
    "exact_substr_removal",  # r12
    "fixed_size_doc_sample",  # r12
    "hard_negative_mining",  # r12
    "ivf_pq_search_topk",  # r12
    "leakage_safe_split_assignment",  # r12
    "length_weighted_doc_sample",  # r12
    "lineitem_unpivot_measures",  # r12
    "mg_heavy_hitter_pairs",  # r12
    "multimodal_audio_windows",  # r12
    "multimodal_decode_flac",  # r12
    "multimodal_decode_png",  # r12
    "multimodal_image_tiles",  # r12
    "multimodal_resize_stats",  # r12
    "near_dup_pairs_winnow",  # r12
    "pq_adc_topk",  # r12
    "pq_code_assignment",  # r12
    "price_percentiles_by_flag",  # r12
    "quantile_sketch_estimates",  # r12
    "salted_hot_key_join",  # r12
    "salted_user_event_lists",  # r12
    "semantic_dedup_keep_list",  # r12
    "small_quantity_order_revenue",  # r12
    "split_leakage_audit",  # r12
    "streaming_attributed_purchases",  # r12
    "streaming_attribution_with_timeouts",  # r12
    "streaming_batch_equivalence",  # r12
    "streaming_dedup_replay",  # r12
    "streaming_running_user_stats",  # r12
    "streaming_session_windows",  # r12
    "streaming_static_enrichment",  # r12
    "streaming_windowed_alert_counts",  # r12
    "tablelog_checkpoint_fold",  # r12
    "temperature_mixture_sample",  # r12
    "value_histogram",  # r12
    "value_outliers_exact",  # r12
    "weather_alert_feed",  # r12
    "weather_comfort_heat_index",  # r12
    "weather_conversions",  # r12
    "weather_daily_summary",  # r12
    "weather_quality_flags",  # r12
    "weather_severity_class",  # r12
    "weather_time_features",  # r12
    "zorder_layout_audit",  # r12
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
