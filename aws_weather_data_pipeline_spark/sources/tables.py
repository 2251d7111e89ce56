"""Loaders for the driver-provided parquet tables.

Counterpart of the reference's batch scans (SURVEY §2.1 S4-S6): where the
reference hand-lists S3 keys and pd.concat's per-file reads
(airflow/src/load_to_postgres.py:89-172), we hand the whole directory to
``spark.read.parquet`` and let Catalyst do partition pruning, predicate
pushdown, and column pruning. Explicit schemas are unnecessary here
because parquet is self-describing; JSON/CSV readers (readers.py) always
declare schemas (reference scripts/glue_weather_etl.py:50-57).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _read_one(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Some driver tables carry TIMESTAMP(NANOS) parquet columns, which
    # Spark only reads as LongType (nanos since epoch) under the
    # nanosAsLong flag. Convert back to a real timestamp, truncating
    # ns -> µs exactly as DuckDB/Spark µs semantics do. `div` is integer
    # division, so the whole conversion stays in codegen — no UDF.
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load the named parquet tables from ``sf_dir`` as DataFrames.

    Safe under any caller-provided SparkSession (the driver harness
    builds its own): the nanos flag is a runtime SQL conf.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return {name: _read_one(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for ``spark.sql``."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
