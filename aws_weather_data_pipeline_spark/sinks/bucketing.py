"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a repeated fact⋈fact join is the
shuffle. Bucketing pays that shuffle ONCE at write time: both tables
hash-cluster rows into the same number of buckets on the join key, so
every subsequent join (or groupBy on the key) reads bucket i against
bucket i with NO Exchange in the plan — verified by
tests/test_bucketing.py, which asserts the shuffle nodes disappear.

Spark requires bucketed data to live in the catalog (bucket metadata
is table metadata, not file metadata); ``path`` makes it an external
table so the files stay where the caller wants them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` hash-bucketed (and sorted) by ``key``.

    Sorting within buckets additionally enables sort-merge joins
    without a per-task sort. ``n_buckets`` must match between tables
    that will join (Spark can cope with multiples, but matching is
    the predictable configuration).
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog)."""
    return spark.table(table)
