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
# Round 10's window (committed at round start, per the checklist):
# the steady-state 3-round cycle's first full turn — the 50 queries
# whose latest driver row is r07 (age 3 at r10, the mandatory block;
# tools/rotate_window.py emitted exactly this set, zero free slots).
# Two zero-slack swaps executed mid-round:
# (1) top10_orders_by_price retired (its O4 top-k semantics and
# TakeOrderedAndProject plan pin are strictly covered by
# recent_events_feed — identical single-table ORDER BY measure DESC +
# key tie-break + LIMIT shape — and by top_revenue_orders for the
# over-an-aggregate form), its window slot transferred to the NEW
# incremental_agg_maintenance (plans/tablelog_queries.py:
# driver-grade evidence for sinks/incremental.py, the r09 O(delta)
# materialized-view sink).
# (2) filter_isin_projection retired (P4 isin + P5 projection are
# strictly covered by weather_alert_feed's isin + 9-column select,
# green r09 row; pushdown pins live on promo_revenue_ratio /
# date_range_revenue), its slot transferred to the NEW
# tablelog_manifest_stats (plans/tablelog_queries.py: the
# manifest-only COUNT/MIN/MAX zero-task fast path, driver-checked —
# VERDICT r09 task 7).
#
# Capacity ledger: the sustainability test caps the catalog at
# 50 * MAX_AGE_ROUNDS = 150 queries. r09 ended AT the cap (150 =
# 50 r07-latest + 50 r08-latest + 50 r09-latest). At N=150 every
# round's window is exactly its mandatory aged block — ZERO slack —
# so the standing protocol for any new query or schema/semantics
# change is: retire (or subsume) one query in the SAME commit,
# swapping its window slot to the new/changed query; never grow past
# 150 and never let a changed query ride on stale driver evidence.
# Committed plan of record for r11: retire multimodal_frame_sample
# (latest row r08, mandatory at r11) and register
# multimodal_decode_avi in its slot — see plans/multimodal.py above
# AVI_FRAMES_SQL.
DRIVER_WINDOW = (
    # --- the 50 queries whose latest driver row is r07 ---
    # composite multi-stage plans first (most likely to regress),
    # then similarity/text, multimodal, relational/window blocks.
    "corpus_build_manifest",
    "dedup_cascade_keep_list",
    "near_dup_pairs_minhash",
    "near_dup_clusters",
    "dedup_exact_content",
    "decontaminate_ngram_overlap",
    "dataset_split_assignment",
    "deterministic_doc_sample",
    "sequence_pack_assignment",
    "pagerank_trade_graph",
    "scd2_user_state",
    "asof_last_click_before_purchase",
    "ann_ivf_probe_topk",
    "ann_recall_at_k",
    "knn_cosine_topk",
    "bm25_topk",
    "tfidf_top_terms",
    "doc_language_id",
    "hll_distinct_sketch",
    "multimodal_decode_gif",
    "multimodal_feature_extract",
    "user_session_windows",
    "tumbling_hourly_by_type",
    "user_activity_coverage",
    "pricing_summary",
    "regional_revenue",
    "promo_revenue_ratio",
    "rollup_returnflag_status",
    "pivot_status_qty",
    "order_date_arithmetic",
    "top_revenue_orders",
    # NEW r10, never driver-checked (slot from the retired
    # top10_orders_by_price per the zero-slack swap protocol)
    "incremental_agg_maintenance",
    "customers_without_urgent_orders",
    "union_segments",
    "global_stats",
    "conditional_counts",
    "event_type_share",
    "dominant_event_type",
    "latest_event_per_user",
    "dedup_user_event_type",
    "recent_events_feed",
    "nations_sorted",
    # NEW r10, never driver-checked (slot from the retired
    # filter_isin_projection per the zero-slack swap protocol)
    "tablelog_manifest_stats",
    "parse_props_json",
    "pack_explode_flatten",
    "null_drop_critical",
    "range_validity_flags",
    "coercion_null_on_error",
    "validation_aggregates",
    "weather_current_status",
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
