"""Spot-check named catalog queries against their DuckDB oracles.

Usage: python tools/check_query.py name [name ...]
Env:   SPARK_GRAFT_SIM_SF overrides the sf dir (default sf0.01).

Same comparison as tools/driver_sim.py, restricted to the named
queries — the fast inner loop while developing a new operator.
"""

import math
import os
import sys
from datetime import datetime

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")

spark = (
    SparkSession.builder.master("local[8]").appName("check-query")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

qs, osql = e.queries(), e.oracle_sql()

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None)
    return v


fails = []
for name in sys.argv[1:]:
    if name not in qs:
        print(f"  UNKNOWN  {name}")
        fails.append(name)
        continue
    sdf = qs[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in osql:
        print(f"  rows-only  {name}: {len(srows)} rows")
        continue
    res = con.execute(osql[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    ok = sorted(scols) == sorted(dcols)
    if not ok:
        print(f"  SCHEMA   {name}: spark={sorted(scols)} duckdb={sorted(dcols)}")
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sset = sorted([tuple(norm(r[i]) for i in so) for r in srows],
                  key=lambda t: tuple((x is None, str(x)) for x in t))
    dset = sorted([tuple(norm(r[i]) for i in do) for r in drows],
                  key=lambda t: tuple((x is None, str(x)) for x in t))
    ok = ok and sset == dset
    print(f"  {'MATCH    ' if ok else 'MISMATCH '}{name}: "
          f"spark={len(srows)} duckdb={len(drows)}")
    if not ok:
        fails.append(name)
        shown = 0
        for a, b in zip(sset, dset):
            if a != b and shown < 3:
                print("    spark :", a)
                print("    duckdb:", b)
                shown += 1

print("RESULT:", "ALL MATCH" if not fails else f"FAILURES: {fails}")
sys.exit(1 if fails else 0)
