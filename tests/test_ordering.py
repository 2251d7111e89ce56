"""Ordering assertions for the sort queries (O1/O2).

The driver's value-hash is order-insensitive, so these tests are what
actually pins the ORDER BY semantics.
"""

from __future__ import annotations

from aws_weather_data_pipeline_spark.plans.catalog import build_catalog

CATALOG = build_catalog()


def test_nations_sorted_ascending(spark, sf_dir):
    rows = CATALOG.queries["nations_sorted"].builder(spark, sf_dir).collect()
    names = [r["n_name"] for r in rows]
    assert names == sorted(names)
    assert len(names) == 25


def test_recent_events_feed_descending(spark, sf_dir):
    rows = (
        CATALOG.queries["recent_events_feed"].builder(spark, sf_dir).collect()
    )
    ts = [r["ts"] for r in rows]
    assert ts == sorted(ts, reverse=True)
    assert len(rows) == 100


def test_top_revenue_orders_descending(spark, sf_dir):
    # carries the ORDER-BY-aggregate-DESC assertion after r10 retired
    # top10_orders_by_price (recent_events_feed covers the raw-measure
    # descending form above)
    rows = (
        CATALOG.queries["top_revenue_orders"]
        .builder(spark, sf_dir)
        .collect()
    )
    revenues = [r["revenue"] for r in rows]
    assert revenues == sorted(revenues, reverse=True)
