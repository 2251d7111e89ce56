"""Oracle/Spark result-type audit for every catalog query.

The driver's value hash is TYPE-sensitive across engines: DuckDB
HUGEINT (int128) hashes differently from Spark bigint even when values
are equal (the conditional_counts r01 failure; three more instances
caught in review r02). This test closes the class: for every oracle,
DESCRIBE the SQL in DuckDB (no execution) and compare each column's
type CLASS against the Spark DataFrame schema (also plan-only).

Width differences within a class are fine (int32 vs int64 passed the
real driver in r01 via top3_events_per_user's rank column); HUGEINT is
forbidden outright.
"""

from __future__ import annotations

import duckdb
import pytest

from aws_weather_data_pipeline_spark.plans.catalog import build_catalog
from aws_weather_data_pipeline_spark.sources.tables import TABLE_NAMES
from tests.conftest import SF_SMOKE

CATALOG = build_catalog()

_DUCK_CLASS = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "HUGEINT": "FORBIDDEN-int128",
    "FLOAT": "float",
    "DOUBLE": "float",
    "VARCHAR": "str",
    "TIMESTAMP": "ts",
    "DATE": "date",
    "BOOLEAN": "bool",
}


def _spark_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    # NTZ and LTZ both hash as "ts" in the driver (r01 precedent:
    # global_stats/top10/top_revenue emit NTZ and passed).
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BooleanType):
        return "bool"
    return f"other:{dt.simpleString()}"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    sf = SF_SMOKE
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize(
    "name", sorted(n for n, q in CATALOG.queries.items() if q.oracle)
)
def test_oracle_types_match_spark(name, duck, spark):
    q = CATALOG.queries[name]
    desc = duck.sql(f"DESCRIBE {q.oracle}").fetchall()
    duck_types = {row[0]: row[1] for row in desc}

    sdf = q.builder(spark, SF_SMOKE)
    spark_types = {f.name: _spark_class(f.dataType) for f in sdf.schema}

    assert set(duck_types) == set(spark_types), (
        f"{name}: column names differ: "
        f"duck={sorted(duck_types)} spark={sorted(spark_types)}"
    )
    for col, dtype in duck_types.items():
        base = dtype.split("(")[0]
        dclass = _DUCK_CLASS.get(base, f"other:{dtype}")
        assert dclass != "FORBIDDEN-int128", (
            f"{name}.{col}: DuckDB types this {dtype} — HUGEINT hash-"
            "diverges from Spark bigint in the driver; CAST AS BIGINT "
            "in the oracle"
        )
        sclass = spark_types[col]
        if base.startswith("DECIMAL"):
            dclass = "decimal"
        assert dclass == sclass, (
            f"{name}.{col}: type class mismatch duck={dtype} "
            f"spark={sclass}"
        )


# --------------------------------------------------------------------------
# Float-serialization canonicalization (r02 weather_conversions class)
# --------------------------------------------------------------------------


def test_norm_distinguishes_signed_zero():
    """-0.0 == 0.0 fools ``==`` and numpy alike; the driver's hash sees
    the serialized form. The local harness must treat them as different
    (tests/oracle.py normalizes floats to IEEE-754 bits)."""
    from tests.oracle import _norm

    assert _norm(-0.0) != _norm(0.0)
    assert _norm(1.5) == _norm(1.5)
    # NaN payloads legitimately differ across engines; normalize.
    assert _norm(float("nan")) == _norm(float("nan"))


def test_round_near_zero_signed_zero_diverges_across_engines(spark):
    """Documents the r02 ``weather_conversions`` failure mechanism:
    ``ROUND(-0.04, 1)`` is **+0.0 in Spark** (BigDecimal HALF_UP,
    normalized) but **-0.0 in DuckDB** (binary FP) — equal under ``==``
    and numpy, different in every serialized/hashed form. Every
    event_id ≡ 422 (mod 1200) row hit this (temp_f = 0.18k-76 = -0.04).
    Catalog policy: hashed payloads avoid ROUND-to-double on columns
    whose true value can be negative-and-near-zero (weather_conversions
    emits exact integer fixed-point instead)."""
    import struct

    from pyspark.sql import functions as F

    s = (
        spark.range(1)
        .select(F.round(F.lit(-0.04), 1).alias("r"))
        .collect()[0]
        .r
    )
    d = duckdb.sql("SELECT ROUND(-0.04::DOUBLE, 1) AS r").fetchone()[0]
    assert s == d == 0.0  # numerically indistinguishable...
    assert struct.pack("<d", s) == struct.pack("<d", 0.0)  # Spark: +0.0
    assert struct.pack("<d", d) == struct.pack("<d", -0.0)  # DuckDB: -0.0


# --------------------------------------------------------------------------
# Pending r09 registrations (not yet in the catalog — see the
# plans/catalog.py capacity ledger) get the same audit NOW so their
# registration can't resurrect the HUGEINT class.
# --------------------------------------------------------------------------

_PENDING = {
    "mg_heavy_hitter_pairs": (
        "aws_weather_data_pipeline_spark.plans.sketch",
        "mg_heavy_hitter_pairs",
        "MG_HEAVY_HITTERS_SQL",
    ),
    "bpe_train_merges": (
        "aws_weather_data_pipeline_spark.plans.text",
        "bpe_train_merges",
        "BPE_TRAIN_SQL",
    ),
}


@pytest.mark.parametrize("name", sorted(_PENDING))
def test_pending_query_oracle_types_match_spark(name, duck, spark):
    import importlib

    mod_name, fn_name, sql_name = _PENDING[name]
    mod = importlib.import_module(mod_name)
    sql = getattr(mod, sql_name)
    builder = getattr(mod, fn_name)

    desc = duck.sql(f"DESCRIBE {sql}").fetchall()
    duck_types = {row[0]: row[1] for row in desc}
    sdf = builder(spark, SF_SMOKE)
    spark_types = {f.name: _spark_class(f.dataType) for f in sdf.schema}

    assert set(duck_types) == set(spark_types), (
        f"{name}: column names differ: "
        f"duck={sorted(duck_types)} spark={sorted(spark_types)}"
    )
    for col, dtype in duck_types.items():
        base = dtype.split("(")[0]
        dclass = _DUCK_CLASS.get(base, f"other:{dtype}")
        assert dclass != "FORBIDDEN-int128", (name, col, dtype)
        if base.startswith("DECIMAL"):
            dclass = "decimal"
        assert dclass == spark_types[col], (
            f"{name}.{col}: duck={dtype} spark={spark_types[col]}"
        )
