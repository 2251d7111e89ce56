"""Weather-domain catalog queries (SURVEY §2.2 P1-P6, §2.8 F1-F15).

The driver testdata has no weather table, so each entry *synthesizes*
the reference's weather columns from ``events`` with exact integer
arithmetic (modulo + cast) — both Spark and the DuckDB oracle derive
bit-identical doubles from ``event_id``, making hash-exact comparison of
the downstream transforms possible. The transforms under test are the
engine's production functions (functions/weather.py), whose thresholds
and first-match-wins CASE order replicate scripts/glue_weather_etl.py
:188-433 and api/app.py:28-50; the oracle SQL re-encodes the same CASE
order independently.

FP-determinism rules baked into these entries:
- synthesized inputs are integer-derived (exact in double);
- every float expression is written with the same operation order on
  both sides (neither engine reassociates FP arithmetic);
- cross-engine ROUND on arbitrary doubles is avoided: rounding is only
  compared where the true value is provably ≥0.01 from a rounding
  boundary (F1) or where it happens on exact DECIMALs (F15); elsewhere
  the unrounded value is compared and the reference's rounding is
  covered by unit tests (tests/test_weather_functions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import weather as wx
from ..functions.exact import davg, dec
from ..sources.tables import load_tables
from .registry import QueryCatalog

CATALOG = QueryCatalog()


# --------------------------------------------------------------------------
# Synthesized weather frame (shared by every entry)
# --------------------------------------------------------------------------


def _weatherized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → weather-shaped columns via exact integer arithmetic."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    eid = F.col("event_id")
    syn = ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        ((eid % 1200).cast("double") / 10 - 60).alias("temperature_celsius"),
        (eid % 110).cast("double").alias("humidity_percent"),
        ((eid % 140) + 930).cast("double").alias("pressure_hpa"),
        (eid % 100).cast("double").alias("wind_speed_kmh"),
        (eid % 60).cast("double").alias("precipitation_mm"),
        ((eid % 15).cast("double") / 2).alias("visibility_km"),
        (eid % 13).cast("int").alias("uv_index"),
    )
    return syn.withColumn(
        "heat_index_celsius",
        wx.heat_index_celsius_raw("temperature_celsius", "humidity_percent"),
    )


#: Oracle-side mirror of ``_weatherized``: CTE chain ending in a
#: ``weather`` relation. Layered so temp_f / hi_simple / hi_f are named
#: once and every use evaluates the identical double.
_W = """
WITH w0 AS (
  SELECT event_id, ts, user_id, event_type,
         CAST(event_id % 1200 AS DOUBLE) / 10 - 60 AS temperature_celsius,
         CAST(event_id % 110 AS DOUBLE) AS humidity_percent,
         CAST((event_id % 140) + 930 AS DOUBLE) AS pressure_hpa,
         CAST(event_id % 100 AS DOUBLE) AS wind_speed_kmh,
         CAST(event_id % 60 AS DOUBLE) AS precipitation_mm,
         CAST(event_id % 15 AS DOUBLE) / 2 AS visibility_km,
         CAST(event_id % 13 AS INTEGER) AS uv_index
  FROM events
),
w1 AS (SELECT *, temperature_celsius * 9 / 5 + 32 AS temp_f FROM w0),
w2 AS (SELECT *,
         0.5 * (temp_f + 61.0 + ((temp_f - 68.0) * 1.2)
                + (humidity_percent * 0.094)) AS hi_simple
       FROM w1),
w3 AS (SELECT *,
         CASE WHEN hi_simple > 79 THEN
           -42.379 + 2.04901523 * temp_f + 10.14333127 * humidity_percent
           - 0.22475541 * temp_f * humidity_percent
           - 0.00683783 * temp_f * temp_f
           - 0.05481717 * humidity_percent * humidity_percent
           + 0.00122874 * temp_f * temp_f * humidity_percent
           + 0.00085282 * temp_f * humidity_percent * humidity_percent
           - 0.00000199 * temp_f * temp_f * humidity_percent * humidity_percent
         ELSE hi_simple END AS hi_f
       FROM w2),
weather AS (SELECT *,
         CASE WHEN temp_f < 80 THEN temperature_celsius
              ELSE (hi_f - 32) * 5 / 9 END AS heat_index_celsius
       FROM w3)
"""

_SEVERITY_SQL = """
  CASE WHEN precipitation_mm > 50 THEN 'Extreme'
       WHEN precipitation_mm > 25 THEN 'Severe'
       WHEN wind_speed_kmh > 60 THEN 'Severe'
       WHEN visibility_km < 1 THEN 'Severe'
       WHEN (precipitation_mm > 10 OR wind_speed_kmh > 40
             OR visibility_km < 3) THEN 'Moderate'
       WHEN uv_index > 10 THEN 'Moderate'
       ELSE 'Normal' END
"""

_ALERT_SQL = """
  CASE WHEN heat_index_celsius > 54 OR precipitation_mm > 50
            OR wind_speed_kmh > 80 THEN 'CRITICAL'
       WHEN heat_index_celsius > 41 OR precipitation_mm > 25
            OR wind_speed_kmh > 60 OR visibility_km < 2
            OR uv_index > 10 THEN 'WARNING'
       WHEN heat_index_celsius > 32 OR precipitation_mm > 10
            OR wind_speed_kmh > 40 OR uv_index > 8 THEN 'WATCH'
       ELSE 'NORMAL' END
"""


# --------------------------------------------------------------------------
# F1/F2 — conversions
# --------------------------------------------------------------------------


@CATALOG.add(
    "weather_conversions",
    _W
    + """
    SELECT event_id,
           CAST(ROUND(temperature_celsius * 10) AS BIGINT)
               AS temperature_celsius_tenths,
           CAST(ROUND(temp_f * 10) AS BIGINT)
               AS temperature_fahrenheit_tenths,
           CAST(ROUND((temperature_celsius + 273.15) * 100) AS BIGINT)
               AS temperature_kelvin_centi
    FROM weather
    """,
    doc="F1/F2 temperature conversions (glue_weather_etl.py:188-212), "
    "hashed as exact integer fixed-point. Round 2's hash_match=false on "
    "this query reproduced with bit-identical doubles on both engines, "
    "so the divergence is in double ROUND/serialization inside the "
    "driver's hash path — the compared payload is therefore all-BIGINT: "
    "C×10 = (event_id%1200)-600 is an exact integer; F×10 = "
    "(18k-7600)/10 has fractional part in {0,.2,.4,.6,.8} (never a "
    "rounding tie, ≥0.2 from every boundary); K×100 = 10k+21315 is an "
    "exact integer. ROUND-to-integer on these is engine-independent. "
    "The reference's double-valued round(F,1)/round(K,1) forms stay "
    "covered by tests/test_weather_functions.py.",
    tags=("weather", "scalar"),
)
def weather_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _weatherized(spark, sf_dir)
    return w.select(
        "event_id",
        F.round(F.col("temperature_celsius") * 10)
        .cast("bigint")
        .alias("temperature_celsius_tenths"),
        F.round(wx.fahrenheit_raw("temperature_celsius") * 10)
        .cast("bigint")
        .alias("temperature_fahrenheit_tenths"),
        F.round(wx.kelvin_raw("temperature_celsius") * 100)
        .cast("bigint")
        .alias("temperature_kelvin_centi"),
    )


# --------------------------------------------------------------------------
# F13 + F3 — heat index and comfort classification
# --------------------------------------------------------------------------


@CATALOG.add(
    "weather_comfort_heat_index",
    _W
    + """
    SELECT event_id, heat_index_celsius,
           CASE WHEN heat_index_celsius < 27 THEN 'Comfortable'
                WHEN heat_index_celsius < 32 THEN 'Caution'
                WHEN heat_index_celsius < 41 THEN 'Extreme Caution'
                WHEN heat_index_celsius < 54 THEN 'Danger'
                ELSE 'Extreme Danger' END AS comfort_level
    FROM weather
    """,
    doc="F13 NOAA Rothfusz heat index (api/app.py:28-50: identity <80°F, "
    "simple formula, full 9-term regression >79) feeding the F3 5-way "
    "comfort CASE (glue_weather_etl.py:233-240). Both engines evaluate "
    "the identical FP expression tree, so the piecewise branches and the "
    "classification agree bit-for-bit.",
    tags=("weather", "scalar"),
)
def weather_comfort_heat_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _weatherized(spark, sf_dir)
    return w.select(
        "event_id",
        "heat_index_celsius",
        wx.comfort_level("heat_index_celsius").alias("comfort_level"),
    )


# --------------------------------------------------------------------------
# F4 — weather severity
# --------------------------------------------------------------------------


@CATALOG.add(
    "weather_severity_class",
    _W
    + f"""
    SELECT event_id, precipitation_mm, wind_speed_kmh, visibility_km, uv_index,
           {_SEVERITY_SQL} AS weather_severity
    FROM weather
    """,
    doc="F4 weather severity, first-match-wins order exactly as "
    "glue_weather_etl.py:262-276: Extreme → Severe(precip) → Severe(wind) "
    "→ Severe(vis) → Moderate(disjunction) → Moderate(uv) → Normal. The "
    "uv clause sits AFTER the Moderate disjunction (SURVEY §7.4-4: "
    "reordering changes results; README pseudo-code is wrong, code wins).",
    tags=("weather", "scalar"),
)
def weather_severity_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _weatherized(spark, sf_dir)
    return w.select(
        "event_id",
        "precipitation_mm",
        "wind_speed_kmh",
        "visibility_km",
        "uv_index",
        wx.weather_severity(
            "precipitation_mm", "wind_speed_kmh", "visibility_km", "uv_index"
        ).alias("weather_severity"),
    )


# --------------------------------------------------------------------------
# F5 + P4/P5/P6 + O1 — the alerts feed
# --------------------------------------------------------------------------


@CATALOG.add(
    "weather_alert_feed",
    _W
    + f"""
    SELECT event_id, ts, temperature_celsius, heat_index_celsius,
           precipitation_mm, wind_speed_kmh, visibility_km, uv_index,
           {_ALERT_SQL} AS alert_level
    FROM weather
    WHERE ({_ALERT_SQL}) IN ('WARNING', 'CRITICAL')
      AND ts >= DATE '2024-01-31' - 7
    ORDER BY ts DESC
    """,
    doc="F5 alert level (glue_weather_etl.py:299-323) + the alerts-feed "
    "slice: isin filter (P4, :503-505), column-subset projection (P5, "
    ":508-523), 7-day date-range predicate (P6/F16 — "
    "sql/create_tables.sql:184, anchored to a literal date so both "
    "engines see the same cutoff), ORDER BY ts DESC (O1, :185-186).",
    tags=("weather", "filter", "sort"),
)
def weather_alert_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _weatherized(spark, sf_dir)
    alert = wx.alert_level(
        "heat_index_celsius",
        "precipitation_mm",
        "wind_speed_kmh",
        "visibility_km",
        "uv_index",
    )
    cutoff = F.date_sub(F.to_date(F.lit("2024-01-31")), 7)
    return (
        w.withColumn("alert_level", alert)
        .filter(
            F.col("alert_level").isin("WARNING", "CRITICAL")
            & (F.col("ts") >= cutoff)
        )
        .select(
            "event_id",
            "ts",
            "temperature_celsius",
            "heat_index_celsius",
            "precipitation_mm",
            "wind_speed_kmh",
            "visibility_km",
            "uv_index",
            "alert_level",
        )
        .orderBy(F.col("ts").desc())
    )


# --------------------------------------------------------------------------
# F6-F11 + F14 — time features
# --------------------------------------------------------------------------


@CATALOG.add(
    "weather_time_features",
    """
    SELECT event_id, ts,
           CAST(hour(ts) AS INTEGER) AS hour_of_day,
           CAST(dayofweek(ts) + 1 AS INTEGER) AS day_of_week,
           (dayofweek(ts) + 1) IN (1, 7) AS is_weekend,
           CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 'Morning'
                WHEN hour(ts) BETWEEN 12 AND 17 THEN 'Afternoon'
                WHEN hour(ts) BETWEEN 18 AND 21 THEN 'Evening'
                ELSE 'Night' END AS time_of_day,
           CASE WHEN month(ts) IN (12, 1, 2) THEN 'Winter'
                WHEN month(ts) IN (3, 4, 5) THEN 'Spring'
                WHEN month(ts) IN (6, 7, 8) THEN 'Summer'
                ELSE 'Autumn' END AS season,
           CAST(ts AS DATE) AS reading_date
    FROM events
    """,
    doc="F6-F11 time features + F14 date truncation "
    "(glue_weather_etl.py:329-401, load_to_postgres.py:240). day_of_week "
    "follows Spark's Sunday=1 (the reference's Spark-path semantic; "
    "SURVEY §7.4-1) — DuckDB's dayofweek is Sunday=0, hence the +1 in "
    "the oracle.",
    tags=("weather", "scalar", "temporal"),
)
def weather_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.select(
        "event_id",
        "ts",
        wx.hour_of_day("ts").alias("hour_of_day"),
        wx.day_of_week("ts").alias("day_of_week"),
        wx.is_weekend("ts").alias("is_weekend"),
        wx.time_of_day("ts").alias("time_of_day"),
        wx.season("ts").alias("season"),
        F.to_date("ts").alias("reading_date"),
    )


# --------------------------------------------------------------------------
# F12 + P8 — quality metrics
# --------------------------------------------------------------------------


@CATALOG.add(
    "weather_quality_flags",
    _W
    + """
    SELECT event_id,
           temperature_celsius BETWEEN -50 AND 60 AS is_valid_temperature,
           humidity_percent BETWEEN 0 AND 100 AS is_valid_humidity,
           pressure_hpa BETWEEN 950 AND 1050 AS is_valid_pressure,
           (CAST(temperature_celsius BETWEEN -50 AND 60 AS INTEGER)
            + CAST(humidity_percent BETWEEN 0 AND 100 AS INTEGER)
            + CAST(pressure_hpa BETWEEN 950 AND 1050 AS INTEGER)) / 3 * 100
               AS data_quality_score
    FROM weather
    """,
    doc="F12 quality metrics + P8 range-validity predicates on the "
    "weather thresholds (-50..60, 0..100, 950..1050 — "
    "glue_weather_etl.py:403-433; CHECK-constraint twins "
    "sql/create_tables.sql:70-72). The synthesized ranges deliberately "
    "overflow each bound so every flag takes both values. int/3 is a "
    "fractional divide → double in both engines.",
    tags=("weather", "filter", "scalar"),
)
def weather_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _weatherized(spark, sf_dir)
    return w.select(
        "event_id",
        wx.is_valid_temperature("temperature_celsius").alias(
            "is_valid_temperature"
        ),
        wx.is_valid_humidity("humidity_percent").alias("is_valid_humidity"),
        wx.is_valid_pressure("pressure_hpa").alias("is_valid_pressure"),
        wx.quality_score(
            "temperature_celsius", "humidity_percent", "pressure_hpa"
        ).alias("data_quality_score"),
    )


# --------------------------------------------------------------------------
# A2/A3/A4 + F15 — the daily summary (the reference's flagship aggregate)
# --------------------------------------------------------------------------


@CATALOG.add(
    "weather_daily_summary",
    _W
    + f"""
    , enriched AS (
        SELECT event_type AS city, CAST(ts AS DATE) AS summary_date,
               temperature_celsius, humidity_percent, pressure_hpa,
               wind_speed_kmh, precipitation_mm,
               {_ALERT_SQL} AS alert_level
        FROM weather
    )
    SELECT city, summary_date,
           CAST(SUM(CAST(temperature_celsius AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(temperature_celsius) AS avg_temperature,
           MIN(temperature_celsius) AS min_temperature,
           MAX(temperature_celsius) AS max_temperature,
           CAST(SUM(CAST(humidity_percent AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(humidity_percent) AS avg_humidity,
           CAST(SUM(CAST(pressure_hpa AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(pressure_hpa) AS avg_pressure,
           CAST(SUM(CAST(wind_speed_kmh AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(wind_speed_kmh) AS avg_wind_speed,
           CAST(ROUND(SUM(CAST(precipitation_mm AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS total_precipitation,
           MAX(precipitation_mm) AS max_precipitation,
           COUNT(*) AS reading_count,
           CAST(SUM(CASE WHEN alert_level = 'NORMAL' THEN 1 ELSE 0 END)
                AS BIGINT) AS normal_count,
           CAST(SUM(CASE WHEN alert_level = 'WATCH' THEN 1 ELSE 0 END)
                AS BIGINT) AS watch_count,
           CAST(SUM(CASE WHEN alert_level = 'WARNING' THEN 1 ELSE 0 END)
                AS BIGINT) AS warning_count,
           CAST(SUM(CASE WHEN alert_level = 'CRITICAL' THEN 1 ELSE 0 END)
                AS BIGINT) AS critical_count,
           CAST(SUM(CASE WHEN alert_level IN ('WARNING', 'CRITICAL')
                         THEN 1 ELSE 0 END) AS DOUBLE) * 100.0 / COUNT(*)
               AS alert_percentage
    FROM enriched
    GROUP BY city, summary_date
    """,
    doc="The reference's daily_weather_summary (A2 grouped multi-agg + A3 "
    "conditional counts + A4 derived ratio — "
    "airflow/src/load_to_postgres.py:395-445, sql/create_tables.sql:89-"
    "139), keyed by (city, date) with city := event_type. Averages use "
    "the engine's exact-decimal discipline (functions/exact.py); F15 "
    "ROUND(x,2) is demonstrated on the exact DECIMAL sum where it is "
    "cross-engine-safe (SURVEY §7.4-3: rounding arbitrary doubles is "
    "not). One hash-shuffle on the grouping key; partial aggregation "
    "map-side — scale-safe at any SF.",
    tags=("weather", "agg"),
)
def weather_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _weatherized(spark, sf_dir)
    alert = wx.alert_level(
        "heat_index_celsius",
        "precipitation_mm",
        "wind_speed_kmh",
        "visibility_km",
        "uv_index",
    )

    def cnt(pred):
        return F.sum(F.when(pred, 1).otherwise(0))

    e = w.select(
        F.col("event_type").alias("city"),
        F.to_date("ts").alias("summary_date"),
        "temperature_celsius",
        "humidity_percent",
        "pressure_hpa",
        "wind_speed_kmh",
        "precipitation_mm",
        alert.alias("alert_level"),
    )
    return e.groupBy("city", "summary_date").agg(
        davg("temperature_celsius").alias("avg_temperature"),
        F.min("temperature_celsius").alias("min_temperature"),
        F.max("temperature_celsius").alias("max_temperature"),
        davg("humidity_percent").alias("avg_humidity"),
        davg("pressure_hpa").alias("avg_pressure"),
        davg("wind_speed_kmh").alias("avg_wind_speed"),
        F.round(F.sum(dec("precipitation_mm")), 2)
        .cast("double")
        .alias("total_precipitation"),
        F.max("precipitation_mm").alias("max_precipitation"),
        F.count(F.lit(1)).alias("reading_count"),
        cnt(F.col("alert_level") == "NORMAL").alias("normal_count"),
        cnt(F.col("alert_level") == "WATCH").alias("watch_count"),
        cnt(F.col("alert_level") == "WARNING").alias("warning_count"),
        cnt(F.col("alert_level") == "CRITICAL").alias("critical_count"),
        (
            cnt(F.col("alert_level").isin("WARNING", "CRITICAL")).cast("double")
            * F.lit(100.0)
            / F.count(F.lit(1))
        ).alias("alert_percentage"),
    )


# --------------------------------------------------------------------------
# J1 + A6 + O2 — current status (latest reading per city, agg+join form)
# --------------------------------------------------------------------------


@CATALOG.add(
    "weather_current_status",
    _W
    + """
    , latest AS (
        SELECT event_type, MAX(ts) AS latest_time
        FROM weather GROUP BY event_type
    )
    SELECT w.event_type AS city, w.ts, w.temperature_celsius,
           w.heat_index_celsius, w.pressure_hpa
    FROM weather w
    JOIN latest lr
      ON w.event_type = lr.event_type AND w.ts = lr.latest_time
    ORDER BY city
    """,
    doc="J1, exactly as the reference wrote it: CTE of GROUP BY city, "
    "MAX(ts) (A6) inner-joined back on both keys, ORDER BY city (O2) — "
    "the current_weather_status view, sql/create_tables.sql:194-218. The "
    "agg side is ≤ #cities rows at any SF, so the engine broadcasts it "
    "(this broadcast IS scale-safe, unlike fact-table broadcasts).",
    tags=("weather", "join", "sort"),
)
def weather_current_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _weatherized(spark, sf_dir)
    # Aliased self-join (the agg side derives from w, so unqualified
    # column refs would be ambiguous — the withColumnRenamed on the
    # agg side's key is what disambiguates).
    latest = (
        w.groupBy("event_type")
        .agg(F.max("ts").alias("latest_time"))
        .withColumnRenamed("event_type", "l_event_type")
    )
    return (
        w.join(
            F.broadcast(latest),
            (F.col("event_type") == F.col("l_event_type"))
            & (F.col("ts") == F.col("latest_time")),
        )
        .select(
            F.col("event_type").alias("city"),
            "ts",
            "temperature_celsius",
            "heat_index_celsius",
            "pressure_hpa",
        )
        .orderBy("city")
    )


# --------------------------------------------------------------------------
# P1 — from_json on a real JSON string column
# --------------------------------------------------------------------------


@CATALOG.add(
    "parse_props_json",
    """
    SELECT event_id,
           CASE WHEN json_valid(props)
                     AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                THEN TRY_CAST(props->>'k' AS INTEGER) END AS prop_k
    FROM events
    """,
    doc="P1 from_json + struct projection on the events.props JSON "
    "column (reference from_json(col('data').cast('string'), schema) at "
    "glue_weather_etl.py:146-149). Declared-schema parse; malformed "
    "payloads null out instead of failing — and the oracle mirrors "
    "that contract (json_valid guard + integer-json-type check, "
    "since DuckDB's bare ->> ERRORS on malformed JSON and coerces "
    "quoted numbers where Spark's from_json nulls them; review "
    "r06). TRY_CAST, not CAST: a JSON integer outside INT32 range "
    "passes the BIGINT type guard but overflows the cast — Spark's "
    "from_json nulls it, so the oracle must too instead of raising "
    "Out of Range (ADVICE r06).",
    tags=("weather", "json"),
)
def parse_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.select(
        "event_id",
        F.from_json(F.col("props"), "k INT").getField("k").alias("prop_k"),
    )


# --------------------------------------------------------------------------
# P2/P3 — explode + flatten (pack → unpack round-trip)
# --------------------------------------------------------------------------


@CATALOG.add(
    "pack_explode_flatten",
    """
    SELECT user_id, event_id, value FROM events
    """,
    doc="P2 explode + P3 flatten (glue_weather_etl.py:154-178): rows are "
    "packed into a per-user array<struct> envelope (collect_list + "
    "array_sort, mirroring the reference's readings array), then "
    "exploded and flattened back. The oracle is the identity — the "
    "round-trip must reproduce the input exactly, which pins both the "
    "generator semantics and struct-field flattening.",
    tags=("weather", "json"),
)
def pack_explode_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    packed = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("event_id", "value"))).alias(
            "readings"
        )
    )
    return packed.select(
        "user_id", F.explode("readings").alias("reading")
    ).select("user_id", "reading.event_id", "reading.value")
