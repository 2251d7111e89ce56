"""The weather-domain transform library (SURVEY §2.8 F1-F13).

Native Column expressions only — zero UDFs, everything stays inside
whole-stage codegen. Thresholds, CASE branch order (first-match-wins),
and formulas replicate the reference exactly:

- F1/F2 conversions:        scripts/glue_weather_etl.py:188-212
- F3 comfort:               scripts/glue_weather_etl.py:214-245
- F4 severity:              scripts/glue_weather_etl.py:247-281
- F5 alert level:           scripts/glue_weather_etl.py:283-327
- F6-F11 time features:     scripts/glue_weather_etl.py:329-401
- F12 quality metrics:      scripts/glue_weather_etl.py:403-433
- F13 heat index (NOAA):    api/app.py:28-50
- pipeline order:           scripts/glue_weather_etl.py:438-462

Branch-order notes (SURVEY §7.4-4): in F4, the uv>10 clause sits AFTER
the Moderate disjunction, and in F5 the vis/uv terms appear only in the
WARNING/WATCH tiers — the reference's README pseudo-code disagrees with
its code; code is truth.

day_of_week follows Spark's ``dayofweek`` (Sunday=1), the reference's
Spark-path semantic (glue_weather_etl.py:359-367); its Pandas twin used
Monday=1 — same weekend *days*, different numbering (SURVEY §7.4-1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --------------------------------------------------------------------------
# F1/F2 — temperature conversions
# --------------------------------------------------------------------------


def fahrenheit_raw(celsius: Column | str) -> Column:
    """(C × 9/5) + 32, unrounded. Same operation order as the reference."""
    return _c(celsius) * 9 / 5 + 32


def fahrenheit(celsius: Column | str) -> Column:
    """F1: round((C × 9/5) + 32, 1) — glue_weather_etl.py:200-203."""
    return F.round(fahrenheit_raw(celsius), 1)


def kelvin_raw(celsius: Column | str) -> Column:
    """C + 273.15, unrounded."""
    return _c(celsius) + 273.15


def kelvin(celsius: Column | str) -> Column:
    """F2: round(C + 273.15, 1) — glue_weather_etl.py:205-208."""
    return F.round(kelvin_raw(celsius), 1)


# --------------------------------------------------------------------------
# F3 — comfort classification (5-way CASE on heat index)
# --------------------------------------------------------------------------


def comfort_level(heat_index_celsius: Column | str) -> Column:
    hi = _c(heat_index_celsius)
    return (
        F.when(hi < 27, "Comfortable")
        .when(hi < 32, "Caution")
        .when(hi < 41, "Extreme Caution")
        .when(hi < 54, "Danger")
        .otherwise("Extreme Danger")
    )


# --------------------------------------------------------------------------
# F4 — weather severity (first-match-wins across 4 factors)
# --------------------------------------------------------------------------


def weather_severity(
    precipitation_mm: Column | str,
    wind_speed_kmh: Column | str,
    visibility_km: Column | str,
    uv_index: Column | str,
) -> Column:
    precip, wind = _c(precipitation_mm), _c(wind_speed_kmh)
    vis, uv = _c(visibility_km), _c(uv_index)
    return (
        F.when(precip > 50, "Extreme")
        .when(precip > 25, "Severe")
        .when(wind > 60, "Severe")
        .when(vis < 1, "Severe")
        .when((precip > 10) | (wind > 40) | (vis < 3), "Moderate")
        .when(uv > 10, "Moderate")
        .otherwise("Normal")
    )


# --------------------------------------------------------------------------
# F5 — alert level (ordered CRITICAL → WARNING → WATCH → NORMAL)
# --------------------------------------------------------------------------


def alert_level(
    heat_index_celsius: Column | str,
    precipitation_mm: Column | str,
    wind_speed_kmh: Column | str,
    visibility_km: Column | str,
    uv_index: Column | str,
) -> Column:
    hi, precip = _c(heat_index_celsius), _c(precipitation_mm)
    wind, vis, uv = _c(wind_speed_kmh), _c(visibility_km), _c(uv_index)
    return (
        F.when((hi > 54) | (precip > 50) | (wind > 80), "CRITICAL")
        .when(
            (hi > 41) | (precip > 25) | (wind > 60) | (vis < 2) | (uv > 10),
            "WARNING",
        )
        .when((hi > 32) | (precip > 10) | (wind > 40) | (uv > 8), "WATCH")
        .otherwise("NORMAL")
    )


# --------------------------------------------------------------------------
# F6-F11, F14 — time features
# --------------------------------------------------------------------------


def hour_of_day(ts: Column | str) -> Column:
    return F.hour(_c(ts))


def day_of_week(ts: Column | str) -> Column:
    """Sunday=1 … Saturday=7 (Spark convention; see module docstring)."""
    return F.dayofweek(_c(ts))


def is_weekend(ts: Column | str) -> Column:
    return F.when(day_of_week(ts).isin(1, 7), True).otherwise(False)


def time_of_day(ts: Column | str) -> Column:
    h = hour_of_day(ts)
    return (
        F.when(h.between(6, 11), "Morning")
        .when(h.between(12, 17), "Afternoon")
        .when(h.between(18, 21), "Evening")
        .otherwise("Night")
    )


def season(ts: Column | str) -> Column:
    m = F.month(_c(ts))
    return (
        F.when(m.isin(12, 1, 2), "Winter")
        .when(m.isin(3, 4, 5), "Spring")
        .when(m.isin(6, 7, 8), "Summer")
        .otherwise("Autumn")
    )


# --------------------------------------------------------------------------
# F12 — quality metrics
# --------------------------------------------------------------------------


def is_valid_temperature(celsius: Column | str) -> Column:
    return _c(celsius).between(-50, 60)


def is_valid_humidity(pct: Column | str) -> Column:
    return _c(pct).between(0, 100)


def is_valid_pressure(hpa: Column | str) -> Column:
    return _c(hpa).between(950, 1050)


def quality_score(
    celsius: Column | str, humidity: Column | str, pressure: Column | str
) -> Column:
    """(valid_temp + valid_hum + valid_press) / 3 × 100 ∈ {0, 33.3…, 100}."""
    return (
        (
            is_valid_temperature(celsius).cast("int")
            + is_valid_humidity(humidity).cast("int")
            + is_valid_pressure(pressure).cast("int")
        )
        / 3
        * 100
    )


# --------------------------------------------------------------------------
# F13 — NOAA Rothfusz heat index (api/app.py:28-50), as pure arithmetic
# --------------------------------------------------------------------------

# Rothfusz regression coefficients (public NOAA formula), in the exact
# term order of the reference so the IEEE-754 result is bit-identical.
_HI = (
    -42.379,
    2.04901523,
    10.14333127,
    0.22475541,
    0.00683783,
    0.05481717,
    0.00122874,
    0.00085282,
    0.00000199,
)


def _hi_full(tf: Column, rh: Column) -> Column:
    c = _HI
    return (
        c[0]
        + c[1] * tf
        + c[2] * rh
        - c[3] * tf * rh
        - c[4] * tf * tf
        - c[5] * rh * rh
        + c[6] * tf * tf * rh
        + c[7] * tf * rh * rh
        - c[8] * tf * tf * rh * rh
    )


def heat_index_celsius_raw(
    celsius: Column | str, humidity: Column | str
) -> Column:
    """Piecewise NOAA heat index in °C, unrounded.

    identity below 80 °F → simple formula → full 9-term regression when
    the simple value exceeds 79 °F (api/app.py:28-50).
    """
    tc, rh = _c(celsius), _c(humidity)
    tf = tc * 9 / 5 + 32
    simple = 0.5 * (tf + 61.0 + ((tf - 68.0) * 1.2) + (rh * 0.094))
    hi_f = F.when(simple > 79, _hi_full(tf, rh)).otherwise(simple)
    return F.when(tf < 80, tc).otherwise((hi_f - 32) * 5 / 9)


def heat_index_celsius(celsius: Column | str, humidity: Column | str) -> Column:
    """F13, rounded to 1 decimal like the reference's generator."""
    tc = _c(celsius)
    tf = tc * 9 / 5 + 32
    return F.when(tf < 80, tc).otherwise(
        F.round(heat_index_celsius_raw(tc, _c(humidity)), 1)
    )


# --------------------------------------------------------------------------
# The six pipeline stages (glue_weather_etl.py:438-462 order) + composer
# --------------------------------------------------------------------------


def add_temperature_conversions(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "temperature_fahrenheit", fahrenheit("temperature_celsius")
    ).withColumn("temperature_kelvin", kelvin("temperature_celsius"))


def add_comfort_classification(df: DataFrame) -> DataFrame:
    return df.withColumn("comfort_level", comfort_level("heat_index_celsius"))


def add_weather_severity(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "weather_severity",
        weather_severity(
            "precipitation_mm", "wind_speed_kmh", "visibility_km", "uv_index"
        ),
    )


def add_alert_level(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "alert_level",
        alert_level(
            "heat_index_celsius",
            "precipitation_mm",
            "wind_speed_kmh",
            "visibility_km",
            "uv_index",
        ),
    )


def add_time_features(df: DataFrame) -> DataFrame:
    df = df.withColumn("timestamp_parsed", F.to_timestamp(F.col("timestamp")))
    return (
        df.withColumn("hour_of_day", hour_of_day("timestamp_parsed"))
        .withColumn("day_of_week", day_of_week("timestamp_parsed"))
        .withColumn("is_weekend", is_weekend("timestamp_parsed"))
        .withColumn("time_of_day", time_of_day("timestamp_parsed"))
        .withColumn("season", season("timestamp_parsed"))
    )


def add_quality_metrics(df: DataFrame) -> DataFrame:
    return (
        df.withColumn(
            "is_valid_temperature", is_valid_temperature("temperature_celsius")
        )
        .withColumn("is_valid_humidity", is_valid_humidity("humidity_percent"))
        .withColumn("is_valid_pressure", is_valid_pressure("pressure_hpa"))
        .withColumn(
            "data_quality_score",
            quality_score(
                "temperature_celsius", "humidity_percent", "pressure_hpa"
            ),
        )
    )


def apply_transformations(df: DataFrame) -> DataFrame:
    """All six families, in the reference's pipeline order.

    Pure DataFrame→DataFrame so the SAME function serves batch and
    ``foreachBatch`` streaming (one code path — SURVEY §7.1).
    """
    for stage in (
        add_temperature_conversions,
        add_comfort_classification,
        add_weather_severity,
        add_alert_level,
        add_time_features,
        add_quality_metrics,
    ):
        df = stage(df)
    return df
