"""Data-layout catalog query: Z-order tile audit over ``events``.

Companion to :mod:`..operators.layout` (the write-side operator): this
query computes the Morton interleave of two event dimensions, groups
rows into code-range tiles (the row sets that would share an output
file under ``zorder_repartition``), and reports each tile's min/max
span in BOTH dimensions — the exact numbers a parquet footer would
carry, i.e. the file-skipping effectiveness of the layout. The pytest
twin asserts every tile's span is bounded by the tile edge in both
dimensions, the property single-column sorting cannot provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.layout import morton_expr_duckdb, morton_expr_spark
from ..sources.tables import load_spread
from .registry import QueryCatalog

CATALOG = QueryCatalog()

#: Bits per dimension; shifting the interleaved code right by
#: ZORDER_TILE_BITS yields 2^ZORDER_TILE_BITS = 256-code tiles
#: (16×16 in (x, y) — the "≤16 values per dimension" span the audit
#: pins; review r06 corrected a comment that squared this to 65536).
ZORDER_BITS = 8
ZORDER_TILE_BITS = 8

#: The two clustered dimensions, 8 bits each: a user bucket and the
#: hour-of-month — the (entity, time) pair every event-table filter
#: hits.
_X_SPARK = "cast(user_id % 256 as bigint)"
_Y_SPARK = "cast(((dayofmonth(ts) - 1) * 24 + hour(ts)) % 256 as bigint)"
_X_SQL = "CAST(user_id % 256 AS BIGINT)"
_Y_SQL = "CAST(((day(ts) - 1) * 24 + hour(ts)) % 256 AS BIGINT)"


@CATALOG.add(
    "zorder_layout_audit",
    f"""
    WITH d AS (
        SELECT {_X_SQL} AS x, {_Y_SQL} AS y FROM events
    ),
    z AS (
        SELECT x, y,
               {morton_expr_duckdb("x", "y", ZORDER_BITS)} AS zcode
        FROM d
    )
    SELECT CAST(zcode >> {ZORDER_TILE_BITS} AS BIGINT) AS tile,
           COUNT(*) AS n_events,
           CAST(MIN(x) AS BIGINT) AS x_min,
           CAST(MAX(x) AS BIGINT) AS x_max,
           CAST(MIN(y) AS BIGINT) AS y_min,
           CAST(MAX(y) AS BIGINT) AS y_max
    FROM z
    GROUP BY 1
    """,
    doc=f"Z-order (Morton) layout audit: interleave {ZORDER_BITS} bits "
    "of a user bucket with the event's hour-of-month, group rows into "
    f"2^{ZORDER_TILE_BITS}-code tiles (the file grains "
    "zorder_repartition writes), and report each tile's min/max span "
    "in both dimensions — the parquet-footer statistics that decide "
    "file skipping. Because a Morton range is an axis-aligned tile, "
    "every tile spans ≤ 16 values in EACH dimension (pytest-asserted), "
    "so a selective filter on user OR time prunes ~15/16 of files; a "
    "layout sorted by one column alone leaves the other's ranges "
    "degenerate (full-width). The interleave is pure shift/mask "
    "integer arithmetic inside whole-stage codegen — engine-exact, "
    "zero UDFs — and the audit itself is one map-side-combined "
    "aggregation on the tile id. This is the write-layout strategy "
    "(Delta/Iceberg ZORDER BY) that makes the 100 TB scan story "
    "concrete: cluster on the 2-3 columns queries actually filter.",
    tags=("layout", "agg"),
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_spread(spark, sf_dir, "events")
    d = ev.select(
        F.expr(_X_SPARK).alias("x"), F.expr(_Y_SPARK).alias("y")
    )
    z = d.withColumn(
        "zcode", F.expr(morton_expr_spark("x", "y", ZORDER_BITS))
    )
    return (
        z.groupBy(
            F.expr(f"cast(shiftright(zcode, {ZORDER_TILE_BITS}) as bigint)")
            .alias("tile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("x").cast("bigint").alias("x_min"),
            F.max("x").cast("bigint").alias("x_max"),
            F.min("y").cast("bigint").alias("y_min"),
            F.max("y").cast("bigint").alias("y_max"),
        )
    )
