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


def test_top10_orders_descending(spark, sf_dir):
    rows = (
        CATALOG.queries["top10_orders_by_price"]
        .builder(spark, sf_dir)
        .collect()
    )
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)
