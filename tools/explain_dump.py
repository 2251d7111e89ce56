"""Dump ``explain("formatted")`` for catalog queries to files.

Usage: python tools/explain_dump.py OUTDIR [name ...]

With no names, dumps every catalog query. Each query's BUILDER runs
(so fixture-constructing queries pay their fixture cost and iterative
algorithms run their loops — the returned frame's plan is what the
bench times via the noop sink), then the formatted physical plan of
the returned DataFrame is written to ``OUTDIR/<name>.txt``.

Runs under the exact bench.py session confs so the captured plans are
the bench's plans (shuffle partitions, split size, AQE flags).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)

    os.environ["TZ"] = "UTC"
    time.tzset()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from aws_weather_data_pipeline_spark.plans.catalog import build_catalog
    from aws_weather_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="explain-dump",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1 << 20),
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    catalog = build_catalog()
    targets = names or list(catalog.queries)
    unknown = [n for n in targets if n not in catalog.queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    failed = []
    for name in targets:
        q = catalog.queries[name]
        t0 = time.perf_counter()
        try:
            df = q.builder(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
            print(
                f"ok   {name}  build={time.perf_counter() - t0:.2f}s",
                file=sys.stderr,
            )
        except Exception as exc:  # noqa: BLE001 - record and continue
            failed.append(name)
            print(f"FAIL {name}: {exc}", file=sys.stderr)
        finally:
            spark.catalog.clearCache()
    if failed:
        print(f"failed: {failed}", file=sys.stderr)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
