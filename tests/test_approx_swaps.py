"""The documented 100 TB approximate swaps actually work.

Several catalog docstrings (events_table_profile,
price_percentiles_by_flag, hll_distinct_sketch) document the
at-scale substitution: exact COUNT(DISTINCT) / percentile() become
approx_count_distinct / approx_percentile on a real cluster, where
exact forms either buffer whole partitions or add a shuffle. Those
claims are only credible if the approximate forms produce answers
within their advertised error on this engine's actual data — this
suite executes the swap and bounds the error.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_weather_data_pipeline_spark.sources.tables import load_tables


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    r = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
    ).first()
    # rsd=0.05 is one standard deviation; 3 sigma is the sane bound.
    assert abs(r["approx"] - r["exact"]) <= max(3, 0.15 * r["exact"]), r


def test_approx_percentile_within_tolerance(spark, sf_dir):
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    r = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr(
            "approx_percentile(l_extendedprice, 0.5, 1000)"
        ).alias("approx"),
    ).first()
    # accuracy=1000 guarantees rank error <= n/1000; translate to a
    # loose value bound: within 5% of the exact median's magnitude.
    assert abs(r["approx"] - r["exact"]) <= 0.05 * abs(r["exact"]), r
