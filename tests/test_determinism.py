"""Partitioning-invariance: results must be bit-identical at any
shuffle width.

SCALE.md claims every aggregate routes doubles through DECIMAL
intermediates precisely so that partial-aggregation ORDER — which
changes with the shuffle partition count, i.e. with cluster size —
cannot shift a single ulp. This test is that claim, executed: the same
query at shuffle width 3 and 29 must produce exactly equal rows,
doubles included. A raw double SUM would fail this intermittently.
"""

from __future__ import annotations

import pytest

from aws_weather_data_pipeline_spark.plans.catalog import build_catalog

CATALOG = build_catalog()

#: Queries whose outputs contain double aggregates over many rows —
#: the ones partial-aggregation order could plausibly perturb.
FLOAT_AGG_QUERIES = (
    "pricing_summary",
    "global_stats",
    "weather_daily_summary",
    "user_session_windows",
    "trailing_hour_user_stats",
    "tfidf_top_terms",
    "promo_revenue_ratio",
)


def _rows(spark, name, sf_dir):
    df = CATALOG.queries[name].builder(spark, sf_dir)
    return sorted((tuple(r) for r in df.collect()), key=repr)


@pytest.mark.parametrize("name", FLOAT_AGG_QUERIES)
def test_results_invariant_under_shuffle_width(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _rows(spark, name, sf_dir)
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        wide = _rows(spark, name, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert narrow == wide, (
        f"{name}: results differ between shuffle widths — a "
        "partial-aggregation-order dependence escaped the DECIMAL "
        "discipline"
    )
