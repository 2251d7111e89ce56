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
# Round 12's window (committed at round start, per the checklist):
# the 3-round cycle's third full turn — the surviving queries whose
# latest driver row is r09 (age 3 at r12), plus TWO swapped-in
# queries: multimodal_decode_flac in the retired wav slot
# (first-commit, r11's plan of record) and tablelog_checkpoint_fold
# replacing tablelog_time_travel_prune IN PLACE mid-round (the
# retiree was itself in the aged block, so the subsuming query
# inherits its window position).
# multimodal_decode_wav retired (subsumption note in
# plans/multimodal.py: multimodal_decode_flac runs the SAME decode
# stage — decode_wav_features, decode_media dispatching on content
# type — with the SAME statistics/oracle recipe, but through the
# COMPRESSED lossless codec functions/flac.py instead of raw PCM;
# the raw-PCM RIFF parse stays unit-pinned by
# tests/test_multimodal.py), slot transferred to
# multimodal_decode_flac (plans/multimodal.py FLAC_AUDIO_SQL).
# tools/rotate_window.py emitted the rotation tuple (the aged-r09
# block, zero free slots beyond the swap).
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
# plans/tablelog_queries.py).
DRIVER_WINDOW = (
    # NEW r12, never driver-checked (slot from the retired
    # multimodal_decode_wav per the zero-slack swap protocol;
    # plans/multimodal.py FLAC_AUDIO_SQL)
    "multimodal_decode_flac",
    # --- the aged block: latest driver row r09 (49 survivors) ---
    "ann_multiprobe_lsh_topk",
    "bpe_train_merges",
    "corpus_filter_funnel",
    "corpus_relative_quality_filter",
    "dedup_attrition_by_source",
    "doc_simpson_diversity",
    "doc_winnowing_fingerprints",
    "exact_substr_removal",
    "fixed_size_doc_sample",
    "hard_negative_mining",
    "ivf_pq_search_topk",
    "leakage_safe_split_assignment",
    "length_weighted_doc_sample",
    "lineitem_unpivot_measures",
    "mg_heavy_hitter_pairs",
    "multimodal_audio_windows",
    "multimodal_decode_png",
    "multimodal_image_tiles",
    "multimodal_resize_stats",
    "near_dup_pairs_winnow",
    "pq_adc_topk",
    "pq_code_assignment",
    "price_percentiles_by_flag",
    "quantile_sketch_estimates",
    "salted_hot_key_join",
    "salted_user_event_lists",
    "semantic_dedup_keep_list",
    "small_quantity_order_revenue",
    "split_leakage_audit",
    "streaming_attributed_purchases",
    "streaming_attribution_with_timeouts",
    "streaming_batch_equivalence",
    "streaming_dedup_replay",
    "streaming_running_user_stats",
    "streaming_session_windows",
    "streaming_static_enrichment",
    "streaming_windowed_alert_counts",
    # NEW r12 (slot inherited in place: tablelog_checkpoint_fold
    # strictly subsumes the retired tablelog_time_travel_prune, which
    # was already mandatory in this window — subsumption note in
    # plans/tablelog_queries.py)
    "tablelog_checkpoint_fold",
    "temperature_mixture_sample",
    "value_histogram",
    "value_outliers_exact",
    "weather_alert_feed",
    "weather_comfort_heat_index",
    "weather_conversions",
    "weather_daily_summary",
    "weather_quality_flags",
    "weather_severity_class",
    "weather_time_features",
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
