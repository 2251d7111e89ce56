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
- ``functions``  : scalar column builders (weather F1-F13, text, vectors).
- ``sources``    : batch/stream readers and idempotent writers.
- ``operators``  : dedup / similarity / window patterns / rollups.
- ``plans``      : the query catalog (queries + DuckDB-oracle SQL twins).
- ``streaming``  : file-stream ingest → foreachBatch two-sink topology.
"""

__version__ = "0.1.0"
