"""Isolated per-query bench probe — the drift-attribution inner loop.

Usage: python tools/bench_probe.py name [name ...] [--runs N]

Runs ONLY the named catalog queries under the exact bench.py session
(same confs, same noop sink, same clearCache hygiene) on an otherwise
idle session, printing every sample. Comparing these isolated numbers
with the full-catalog BENCH_DETAIL.json figures separates plan
regressions (isolated time matches the inflated catalog time) from
ambient host drift (isolated time recovers the old level) — the
protocol VERDICT r06-r08 asked for on every unannotated >1.5x mover.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names, runs = [], 5
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--runs":
            if i + 1 >= len(argv):
                print("--runs needs a value", file=sys.stderr)
                return 2
            runs = int(argv[i + 1])
            i += 2
        else:
            names.append(argv[i])
            i += 1
    if not names:
        print(__doc__)
        return 2

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["TZ"] = "UTC"
    time.tzset()

    from aws_weather_data_pipeline_spark.plans.catalog import build_catalog
    from aws_weather_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="bench-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1 << 20),
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    catalog = build_catalog()

    def run_once(builder) -> float:
        t0 = time.perf_counter()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        spark.catalog.clearCache()
        return elapsed

    # Same warmup as bench.py so run 1 doesn't absorb session costs.
    first = next(iter(catalog.queries.values()))
    run_once(first.builder)

    for name in names:
        q = catalog.queries[name]
        samples = [round(run_once(q.builder), 3) for _ in range(runs)]
        print(f"{name}: min={min(samples)} samples={samples}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
