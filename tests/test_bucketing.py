"""Bucketed-join tests: the shuffle must disappear from the plan."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import Row

from aws_weather_data_pipeline_spark.sinks.bucketing import (
    read_bucketed,
    write_bucketed,
)


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    # Force a non-broadcast join so the Exchange (or its absence) is
    # what the test observes.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_shuffle(spark, tmp_path, no_broadcast):
    left = spark.createDataFrame(
        [Row(k=i % 50, lv=float(i)) for i in range(1000)]
    )
    right = spark.createDataFrame(
        [Row(k=i, rv=f"r{i}") for i in range(50)]
    )
    write_bucketed(left, "b_left", "k", 8, path=str(tmp_path / "l"))
    write_bucketed(right, "b_right", "k", 8, path=str(tmp_path / "r"))
    try:
        bl, br = read_bucketed(spark, "b_left"), read_bucketed(
            spark, "b_right"
        )
        joined = bl.join(br, "k")
        plan = _formatted(joined)
        assert "hashpartitioning" not in plan, plan
        assert joined.count() == 1000

        # The same join on unbucketed frames DOES shuffle — the
        # counterfactual that proves bucketing removed it.
        plain = left.join(right, "k")
        assert "hashpartitioning" in _formatted(plain)

        # groupBy on the bucket key also rides the bucketing.
        agg = bl.groupBy("k").count()
        assert "hashpartitioning" not in _formatted(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")
