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

    # Warm the JVM/codegen/parquet-footer caches on a cheap query so the
    # first measured query doesn't absorb one-time session costs.
    first = next(iter(catalog.queries.values()))
    try:
        run_once(first.builder)
    except Exception as exc:  # pragma: no cover - warmup best-effort
        print(f"warmup failed: {exc}", file=sys.stderr)

    # Two passes per query, keep the minimum: single-shot timings on a
    # shared host are contaminated by CPU-steal noise (observed 10-30x
    # outliers on identical plans) and by one-time costs like Python
    # worker spawn-up; the min of two runs is the steady-state number.
    timings: dict[str, float] = {}
    for name, q in catalog.queries.items():
        best = -1.0
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                run_once(q.builder)
                elapsed = round(time.perf_counter() - t0, 3)
                best = elapsed if best < 0 else min(best, elapsed)
            except Exception as exc:
                print(f"FAIL {name}: {exc}", file=sys.stderr)
                best = -1.0
                break
        timings[name] = best

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    detail = {
        "metric": "catalog_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
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
