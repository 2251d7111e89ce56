"""Declared schemas — never infer (reference glue_weather_etl.py:50-57
makes the same call: "This ensures Spark knows the data types and
structure. Important for performance and data quality!").

``WEATHER_RAW_SCHEMA`` mirrors the reference's 16-field
``ArrayType(StructType)`` envelope (glue_weather_etl.py:59-80) exactly:
string station/city/country/timestamp/wind_direction/weather_condition,
double measures, integer uv_index.
"""

from __future__ import annotations

from pyspark.sql import types as T

WEATHER_READING_SCHEMA = T.StructType(
    [
        T.StructField("station_id", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        # ISO-8601 string at ingest; parsed to timestamp by F6
        # (reference keeps it a string until add_time_features).
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("temperature_celsius", T.DoubleType(), True),
        T.StructField("humidity_percent", T.DoubleType(), True),
        T.StructField("pressure_hpa", T.DoubleType(), True),
        T.StructField("wind_speed_kmh", T.DoubleType(), True),
        T.StructField("wind_direction", T.StringType(), True),
        T.StructField("precipitation_mm", T.DoubleType(), True),
        T.StructField("weather_condition", T.StringType(), True),
        T.StructField("visibility_km", T.DoubleType(), True),
        T.StructField("uv_index", T.IntegerType(), True),
        T.StructField("heat_index_celsius", T.DoubleType(), True),
    ]
)

WEATHER_RAW_SCHEMA = T.StructType(
    [T.StructField("readings", T.ArrayType(WEATHER_READING_SCHEMA), True)]
)

#: Column order of the flattened fact table (pre-transform).
FLAT_COLUMNS = [f.name for f in WEATHER_READING_SCHEMA.fields]

#: Columns added by the six transform families F1-F12 (SURVEY §2.8),
#: in the order apply_transformations emits them.
DERIVED_COLUMNS = [
    "temperature_fahrenheit",
    "temperature_kelvin",
    "comfort_level",
    "weather_severity",
    "alert_level",
    "timestamp_parsed",
    "hour_of_day",
    "day_of_week",
    "is_weekend",
    "time_of_day",
    "season",
    "is_valid_temperature",
    "is_valid_humidity",
    "is_valid_pressure",
    "data_quality_score",
]

#: Full processed-table surface (31 columns, mirroring the reference's
#: processed CSV header local_data/processed/processed_weather_*.csv).
PROCESSED_COLUMNS = FLAT_COLUMNS + DERIVED_COLUMNS

#: Column subset of the alerts feed (reference glue_weather_etl.py:508-523
#: selects 14 of 31 columns for the alerts sink).
ALERT_COLUMNS = [
    "station_id",
    "city",
    "country",
    "timestamp",
    "temperature_celsius",
    "heat_index_celsius",
    "precipitation_mm",
    "wind_speed_kmh",
    "visibility_km",
    "uv_index",
    "weather_condition",
    "weather_severity",
    "alert_level",
    "comfort_level",
]
