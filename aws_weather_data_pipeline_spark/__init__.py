"""aws_weather_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of
AvinJoseph29/AWS-weather-data-pipeline (reference surveyed in SURVEY.md):
the reference's three execution substrates (PySpark-on-Glue streaming,
Pandas batch, PostgreSQL SQL) collapse into one engine built on the Spark
DataFrame/SQL API, letting Catalyst own optimization (pushdown, pruning,
join strategy, AQE) and Structured Streaming own the streaming topology.

Layout
------
- ``session``    : SparkSession factory tuned for local[N] + cluster scale.
- ``schemas``    : declared StructTypes (never infer — reference
                   scripts/glue_weather_etl.py:50-57 makes the same call).
- ``functions``  : scalar/agg column builders — ``weather`` (F1-F13),
                   ``exact`` (decimal-exact aggregation), ``summary``
                   (the daily rollup), ``multimodal`` (binary payloads +
                   mapInPandas feature extraction).
- ``sources``    : parquet table loaders (``tables``) and declared-schema
                   JSON/CSV readers with explode/flatten (``readers``).
- ``sinks``      : partitioned-lake writer, idempotent append,
                   partition upsert, JSON/CSV sinks (``writers``).
- ``plans``      : the query catalog — ``relational``, ``weatherlike``,
                   ``temporal``, ``text``, ``similarity``, ``multimodal``,
                   ``sampling`` modules, each query paired with a
                   DuckDB-oracle twin; ``views`` exposes all of them as
                   ``spark.sql`` temp views.
- ``streaming``  : file-stream ingest → foreachBatch two-sink topology.
- ``runner``     : the daily pipeline (prereqs → load → validate →
                   report), replacing the reference's Airflow DAG.
"""

__version__ = "0.2.0"
