"""Property-based differential tests for the weather transforms.

The reference's own strongest correctness idea is dual implementation
(PySpark vs Pandas twin, scripts/test_transformations.py — SURVEY §5).
This formalizes it: a pure-Python twin of each CASE/formula (written
from the reference's code, independently of functions/weather.py) is
compared against the Spark expressions on hypothesis-generated inputs,
batched into one DataFrame per example for speed.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F

from aws_weather_data_pipeline_spark.functions import weather as wx

# ---- pure-Python twins (reference: glue_weather_etl.py / api/app.py) ----


def py_comfort(hi: float) -> str:
    if hi < 27:
        return "Comfortable"
    if hi < 32:
        return "Caution"
    if hi < 41:
        return "Extreme Caution"
    if hi < 54:
        return "Danger"
    return "Extreme Danger"


def py_severity(precip, wind, vis, uv) -> str:
    if precip > 50:
        return "Extreme"
    if precip > 25 or wind > 60 or vis < 1:
        return "Severe"
    if precip > 10 or wind > 40 or vis < 3:
        return "Moderate"
    if uv > 10:
        return "Moderate"
    return "Normal"


def py_alert(hi, precip, wind, vis, uv) -> str:
    if hi > 54 or precip > 50 or wind > 80:
        return "CRITICAL"
    if hi > 41 or precip > 25 or wind > 60 or vis < 2 or uv > 10:
        return "WARNING"
    if hi > 32 or precip > 10 or wind > 40 or uv > 8:
        return "WATCH"
    return "NORMAL"


def py_heat_index(tc: float, rh: float) -> float:
    tf = tc * 9 / 5 + 32
    if tf < 80:
        return tc
    simple = 0.5 * (tf + 61.0 + ((tf - 68.0) * 1.2) + (rh * 0.094))
    if simple > 79:
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
    else:
        hi_f = simple
    return (hi_f - 32) * 5 / 9


# ---- strategies: finite floats spanning every threshold ----

_f = st.floats(
    min_value=-100, max_value=200, allow_nan=False, allow_infinity=False
)
_uv = st.integers(min_value=0, max_value=20)

CASE_ROWS = st.lists(
    st.tuples(_f, _f, _f, _f, _uv), min_size=1, max_size=300
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=CASE_ROWS)
def test_case_transforms_match_python_twin(spark, rows):
    df = spark.createDataFrame(
        [
            Row(hi=hi, precip=p, wind=w, vis=v, uv=u)
            for hi, p, w, v, u in rows
        ]
    )
    got = df.select(
        wx.comfort_level("hi").alias("comfort"),
        wx.weather_severity("precip", "wind", "vis", "uv").alias("sev"),
        wx.alert_level("hi", "precip", "wind", "vis", "uv").alias("alert"),
    ).collect()
    for (hi, p, w, v, u), r in zip(rows, got):
        assert r["comfort"] == py_comfort(hi), (hi,)
        assert r["sev"] == py_severity(p, w, v, u), (p, w, v, u)
        assert r["alert"] == py_alert(hi, p, w, v, u), (hi, p, w, v, u)


HI_ROWS = st.lists(
    st.tuples(
        st.floats(
            min_value=-40, max_value=60, allow_nan=False, allow_infinity=False
        ),
        st.floats(
            min_value=0, max_value=100, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=300,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=HI_ROWS)
def test_heat_index_matches_python_twin_bitwise(spark, rows):
    # Same IEEE expression tree -> bit-identical, not just approximate.
    df = spark.createDataFrame([Row(tc=tc, rh=rh) for tc, rh in rows])
    got = df.select(
        wx.heat_index_celsius_raw("tc", "rh").alias("hi")
    ).collect()
    for (tc, rh), r in zip(rows, got):
        want = py_heat_index(tc, rh)
        assert math.isclose(r["hi"], want, rel_tol=0, abs_tol=0) or (
            r["hi"] == want
        ), (tc, rh, r["hi"], want)
