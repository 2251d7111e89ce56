"""Unit tests for the weather transform library (functions/weather.py).

Pins the semantic traps SURVEY §7.4 calls out: first-match-wins CASE
order in severity/alert (reference glue_weather_etl.py:262-276,299-323),
the Sunday=1 weekend convention (:359-367), the piecewise heat index
(api/app.py:28-50), and the rounding the catalog queries deliberately
avoid comparing cross-engine (weatherlike.py docstring).

Expected values are hand-computed from the reference's formulas, not
captured from our own output.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from aws_weather_data_pipeline_spark.functions import weather as wx


def _one(spark, expr_col, **cols):
    df = spark.createDataFrame([Row(**cols)])
    return df.select(expr_col.alias("out")).first()["out"]


# -- F1/F2 -----------------------------------------------------------------


@pytest.mark.parametrize(
    "c,f", [(0.0, 32.0), (100.0, 212.0), (-40.0, -40.0), (36.6, 97.9)]
)
def test_fahrenheit(spark, c, f):
    assert _one(spark, wx.fahrenheit("t"), t=c) == f


def test_kelvin(spark):
    assert _one(spark, wx.kelvin("t"), t=26.85) == 300.0


# -- F3 comfort: 5-way CASE boundaries are strict-< ------------------------


@pytest.mark.parametrize(
    "hi,label",
    [
        (26.9, "Comfortable"),
        (27.0, "Caution"),  # boundary: <27 is Comfortable, 27 is not
        (31.9, "Caution"),
        (32.0, "Extreme Caution"),
        (40.9, "Extreme Caution"),
        (41.0, "Danger"),
        (53.9, "Danger"),
        (54.0, "Extreme Danger"),
    ],
)
def test_comfort_level_boundaries(spark, hi, label):
    assert _one(spark, wx.comfort_level("hi"), hi=hi) == label


# -- F4 severity: first-match-wins order (SURVEY §7.4-4) -------------------


@pytest.mark.parametrize(
    "precip,wind,vis,uv,label",
    [
        (51.0, 0.0, 10.0, 0, "Extreme"),
        (26.0, 0.0, 10.0, 0, "Severe"),
        (0.0, 61.0, 10.0, 0, "Severe"),
        (0.0, 0.0, 0.9, 0, "Severe"),
        (11.0, 0.0, 10.0, 0, "Moderate"),
        (0.0, 41.0, 10.0, 0, "Moderate"),
        (0.0, 0.0, 2.9, 0, "Moderate"),
        (0.0, 0.0, 10.0, 11, "Moderate"),  # uv clause AFTER the disjunction
        (0.0, 0.0, 10.0, 10, "Normal"),
        # precip>25 wins over the wind clause even when both fire — order.
        (26.0, 90.0, 10.0, 0, "Severe"),
        # vis<1 also satisfies vis<3 (Moderate) but Severe fires first.
        (0.0, 0.0, 0.5, 11, "Severe"),
    ],
)
def test_weather_severity_order(spark, precip, wind, vis, uv, label):
    got = _one(
        spark,
        wx.weather_severity("p", "w", "v", "u"),
        p=precip,
        w=wind,
        v=vis,
        u=uv,
    )
    assert got == label


# -- F5 alert level: tier thresholds incl. the vis/uv terms README omits ---


@pytest.mark.parametrize(
    "hi,precip,wind,vis,uv,label",
    [
        (55.0, 0.0, 0.0, 10.0, 0, "CRITICAL"),
        (0.0, 51.0, 0.0, 10.0, 0, "CRITICAL"),
        (0.0, 0.0, 81.0, 10.0, 0, "CRITICAL"),
        (42.0, 0.0, 0.0, 10.0, 0, "WARNING"),
        (0.0, 26.0, 0.0, 10.0, 0, "WARNING"),
        (0.0, 0.0, 61.0, 10.0, 0, "WARNING"),
        (0.0, 0.0, 0.0, 1.9, 0, "WARNING"),  # vis term (code, not README)
        (0.0, 0.0, 0.0, 10.0, 11, "WARNING"),  # uv term (code, not README)
        (33.0, 0.0, 0.0, 10.0, 0, "WATCH"),
        (0.0, 11.0, 0.0, 10.0, 0, "WATCH"),
        (0.0, 0.0, 41.0, 10.0, 0, "WATCH"),
        (0.0, 0.0, 0.0, 10.0, 9, "WATCH"),
        (32.0, 10.0, 40.0, 2.0, 8, "NORMAL"),  # every threshold is strict->
    ],
)
def test_alert_level_tiers(spark, hi, precip, wind, vis, uv, label):
    got = _one(
        spark,
        wx.alert_level("h", "p", "w", "v", "u"),
        h=hi,
        p=precip,
        w=wind,
        v=vis,
        u=uv,
    )
    assert got == label


# -- F6-F11 time features --------------------------------------------------


def test_time_features_weekend_convention(spark):
    # 2024-01-06 is a Saturday → dayofweek 7, weekend.
    df = spark.createDataFrame([Row(ts="2024-01-06 13:00:00")]).select(
        F.to_timestamp("ts").alias("ts")
    )
    row = df.select(
        wx.day_of_week("ts").alias("dow"),
        wx.is_weekend("ts").alias("wk"),
        wx.time_of_day("ts").alias("tod"),
        wx.season("ts").alias("season"),
    ).first()
    assert row["dow"] == 7
    assert row["wk"] is True
    assert row["tod"] == "Afternoon"
    assert row["season"] == "Winter"


@pytest.mark.parametrize(
    "hour,bucket",
    [(5, "Night"), (6, "Morning"), (11, "Morning"), (12, "Afternoon"),
     (17, "Afternoon"), (18, "Evening"), (21, "Evening"), (22, "Night")],
)
def test_time_of_day_buckets(spark, hour, bucket):
    df = spark.createDataFrame([Row(ts=f"2024-06-03 {hour:02d}:30:00")])
    got = df.select(
        wx.time_of_day(F.to_timestamp("ts")).alias("b")
    ).first()["b"]
    assert got == bucket


# -- F12 quality score -----------------------------------------------------


@pytest.mark.parametrize(
    "t,h,p,score",
    [
        (25.0, 50.0, 1000.0, 100.0),
        (61.0, 50.0, 1000.0, 2 / 3 * 100),
        (61.0, 101.0, 1000.0, 1 / 3 * 100),
        (61.0, 101.0, 1051.0, 0.0),
    ],
)
def test_quality_score(spark, t, h, p, score):
    got = _one(spark, wx.quality_score("t", "h", "p"), t=t, h=h, p=p)
    assert got == pytest.approx(score, abs=1e-12)


# -- F13 heat index piecewise (api/app.py:28-50) ---------------------------


def test_heat_index_identity_below_80f(spark):
    # 25°C = 77°F < 80 → identity, regardless of humidity.
    assert _one(spark, wx.heat_index_celsius("t", "h"), t=25.0, h=95.0) == 25.0


def test_heat_index_full_regression_hot_humid(spark):
    # 35°C/80% → full Rothfusz regression; reference Python value.
    tc, rh = 35.0, 80.0
    tf = tc * 9 / 5 + 32
    simple = 0.5 * (tf + 61.0 + ((tf - 68.0) * 1.2) + (rh * 0.094))
    assert simple > 79
    hi_f = (
        -42.379
        + 2.04901523 * tf
        + 10.14333127 * rh
        - 0.22475541 * tf * rh
        - 0.00683783 * tf * tf
        - 0.05481717 * rh * rh
        + 0.00122874 * tf * tf * rh
        + 0.00085282 * tf * rh * rh
        - 0.00000199 * tf * tf * rh * rh
    )
    expect = round((hi_f - 32) * 5 / 9, 1)
    assert _one(
        spark, wx.heat_index_celsius("t", "h"), t=tc, h=rh
    ) == expect


def test_apply_transformations_adds_all_derived_columns(spark):
    from aws_weather_data_pipeline_spark.schemas import DERIVED_COLUMNS

    df = spark.createDataFrame(
        [
            Row(
                temperature_celsius=30.0,
                humidity_percent=70.0,
                pressure_hpa=1005.0,
                wind_speed_kmh=20.0,
                precipitation_mm=5.0,
                visibility_km=8.0,
                uv_index=6,
                heat_index_celsius=33.0,
                timestamp="2024-01-15T10:30:00.123456",
            )
        ]
    )
    out = wx.apply_transformations(df)
    for c in DERIVED_COLUMNS:
        assert c in out.columns, c
    row = out.first()
    assert row["comfort_level"] == "Extreme Caution"
    assert row["alert_level"] == "WATCH"
    assert row["weather_severity"] == "Normal"
    assert row["timestamp_parsed"] is not None
