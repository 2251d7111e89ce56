"""Local replica of the driver's Spark-vs-DuckDB comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and values
(columns sorted by name, rows sorted by all columns).

This is NOT provably stronger than the driver's value-hash — the driver
hashes a serialized form we can't see, which is sensitive to things a
Python ``==`` compare is blind to. Two such classes have bitten:

- r01 ``conditional_counts``: DuckDB HUGEINT vs Spark bigint (equal
  values, different types) — closed by tests/test_oracle_types.py.
- r02 ``weather_conversions``: equal-by-``==`` doubles that still
  hash-diverged. The prime suspect is ``-0.0`` vs ``0.0`` from
  cross-engine ROUND (``ROUND(-0.04, 1)`` → a signed zero whose sign
  can differ by engine): ``-0.0 == 0.0`` in Python AND numpy, so both
  the local replay and an exact-value numpy audit pass while any
  serialization (repr, struct, Arrow bits) diverges. Closed here by
  comparing floats BIT-exactly (IEEE-754 payload via struct.pack), so
  signed zeros and payload differences fail locally.

NaN is still normalized to a token on both sides: quiet-NaN bit
patterns legitimately differ across engines while every serializer the
driver could use prints them identically.
"""

from __future__ import annotations

import math
import os
import struct
from datetime import datetime

import duckdb

from aws_weather_data_pipeline_spark.sources.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Bit-exact: distinguishes -0.0 from 0.0 (they compare == but
        # serialize differently in every hashable form).
        return ("f64", struct.pack("<d", v).hex())
    if isinstance(v, datetime):
        return v.replace(tzinfo=None)
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def compare(spark, sf_dir: str, builder, sql: str, name: str = "?"):
    sdf = builder(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    sc, sr = _canon(s_cols, s_rows)
    dc, dr = _canon(d_cols, d_rows)
    assert len(sr) == len(dr), f"{name}: row count spark={len(sr)} duckdb={len(dr)}"
    mismatches = []
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            mismatches.append((i, a, b))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"
    return len(sr)
