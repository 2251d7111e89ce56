"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``aws_weather_data_pipeline_spark``; this file
just adapts the engine's query catalog to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_weather_data_pipeline_spark.plans.catalog import build_catalog

_CATALOG = build_catalog()

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the pricing summary (TPC-H Q1 shape)."""
    return _CATALOG.queries["pricing_summary"].builder(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _CATALOG.builders()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for every SQL-expressible catalog query."""
    return _CATALOG.oracles()
