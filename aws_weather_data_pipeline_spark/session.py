"""SparkSession factory.

One place to encode the scale-aware defaults:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  at the 100 TB design point this is what turns a statically-wrong
  shuffle-partition count into a runtime-right one.
- ``spark.sql.session.timeZone=UTC`` — the DuckDB oracle compares
  naive timestamps; Spark must not shift them through a local zone.
- Arrow enabled — every pandas_udf / applyInPandas path is Arrow-batched.
- shuffle partitions default to the local core count, not 200; on a real
  cluster the caller passes ``shuffle_partitions`` sized to
  ~2-3× total executor cores (AQE coalesces the rest).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_SHUFFLE = max(4, os.cpu_count() or 4)


def get_spark(
    app_name: str = "aws_weather_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else all
    cores) so tests, bench, and the driver harness share one code path;
    on a cluster, pass ``master=None`` with a spark-submit-provided
    master and these configs still apply.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or _DEF_SHUFFLE),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # NOT set: spark.sql.parquet.aggregatePushdown — it only
        # applies on the DataSource V2 path, and parquet sits in the
        # default spark.sql.sources.useV1SourceList, so the flag was a
        # silent no-op (review r11, verified: the executed plan shows
        # a plain FileScan with no PushedAggregation). Flipping
        # parquet to V2 session-wide is a bigger behavioral change
        # than a footer-count is worth; the table log's manifest
        # stats (sinks/tablelog.py snapshot_row_count/column_minmax)
        # are this engine's real metadata fast path. (Bloom-filter
        # runtime join pruning is already on by default in Spark 4.)
        # Reliable RDD/DataFrame checkpoints are cleaned when their
        # frames are GC'd (review r11: connected_components takes one
        # every few rounds; the Spark default leaks them to disk
        # forever in a long-lived maintenance session).
        .config("spark.cleaner.referenceTracking.cleanCheckpoints",
                "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
