"""Mergeable-sketch catalog queries: deterministic HyperLogLog registers.

``COUNT(DISTINCT x)`` at 100 TB forces a full shuffle of every distinct
value. The scalable alternative is a mergeable sketch: each partition
folds its rows into a tiny fixed-size state, states merge associatively
(map-side combine, tree aggregation), and the estimate is read off the
merged state. Spark ships ``approx_count_distinct`` (HLL++), but its
binary sketch is engine-internal — useless for a cross-engine
correctness gate. This module implements the HLL *register table*
itself with engine-neutral arithmetic:

- hash: first 15 hex chars of md5 → 60-bit integer (md5 is the only
  hash both engines compute identically; same choice as SimHash).
- bucket: top 6 bits (m = 64 registers); rank ρ: position of the first
  set bit in the remaining 54 bits (string position over the
  zero-padded binary rendering — ``bin``/``lpad``/``instr`` behave
  identically in Spark and DuckDB), 55 when all 54 bits are zero.
- register value: MAX(ρ) per (group, bucket) — associative and
  commutative, so Spark's partial aggregation and DuckDB's parallel
  aggregation produce the identical register table regardless of row
  order or partitioning. All-integer ⇒ hash-exact.

The register table IS the sketch: 64 small ints per group, mergeable
across days/partitions/clusters by element-wise MAX. The floating-point
estimate (α·m²/Σ2^-ρ, with the small-range linear-counting correction)
is derived in ``hll_estimate`` below and accuracy-tested in pytest
against exact distinct counts; it stays out of the oracle-hashed
payload because Σ2^-ρ is an order-sensitive double sum.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import load_spread
from .registry import QueryCatalog

CATALOG = QueryCatalog()

#: 2^6 = 64 registers; standard error 1.04/sqrt(64) ≈ 13%.
HLL_BUCKET_BITS = 6
HLL_M = 1 << HLL_BUCKET_BITS
#: Bits hashed into the rank after removing the bucket index.
HLL_RANK_BITS = 60 - HLL_BUCKET_BITS
#: Bias-correction constant for m = 64 (Flajolet et al. 2007).
HLL_ALPHA = 0.709


@CATALOG.add(
    "hll_distinct_sketch",
    f"""
    WITH h AS (
        SELECT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
               )::BIGINT AS h
        FROM events
    ),
    parts AS (
        SELECT event_type,
               CAST(h >> {HLL_RANK_BITS} AS BIGINT) AS bucket,
               h & ((1::BIGINT << {HLL_RANK_BITS}) - 1) AS rem
        FROM h
    )
    SELECT event_type, bucket,
           CAST(MAX(CASE WHEN rem = 0 THEN {HLL_RANK_BITS + 1}
                ELSE strpos(lpad(bin(rem), {HLL_RANK_BITS}, '0'), '1')
                END) AS INTEGER) AS max_rho
    FROM parts
    GROUP BY event_type, bucket
    """,
    doc=f"HyperLogLog register table (m = {HLL_M}) for distinct users "
    "per event type — the mergeable-sketch replacement for "
    "COUNT(DISTINCT) at 100 TB. Each row hashes to a 60-bit md5 "
    f"prefix; the top {HLL_BUCKET_BITS} bits pick a register and the "
    "first-set-bit position of the rest is the rank; MAX(rank) per "
    "register is associative, so partial aggregation collapses the "
    "corpus map-side and the shuffle carries at most "
    f"#groups × {HLL_M} rows — independent of data volume. Register "
    "tables from different partitions/days merge by element-wise MAX "
    "(tested). All-integer arithmetic keeps the sketch bit-exact "
    "across engines; the double-valued estimate derives from these "
    "registers and is accuracy-tested in pytest instead of the hashed "
    "payload.",
    tags=("sketch", "agg"),
)
def hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_spread(spark, sf_dir, "events")
    return _hll_registers(ev, "event_type", "user_id")


def _hll_registers(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """(group, bucket, max_rho) HLL register table for ``value_col``."""
    h = F.expr(
        f"cast(conv(substr(md5(cast(`{value_col}` as string)),"
        " 1, 15), 16, 10) as bigint)"
    )
    df = df.select(F.col(group_col), h.alias("h"))
    rem = F.expr(f"h & ((1L << {HLL_RANK_BITS}) - 1)")
    rho = (
        F.when(rem == 0, F.lit(HLL_RANK_BITS + 1))
        .otherwise(
            F.instr(
                F.lpad(F.bin(rem), HLL_RANK_BITS, "0"), "1"
            )
        )
    )
    return (
        df.select(
            group_col,
            F.expr(f"cast(shiftright(h, {HLL_RANK_BITS}) as bigint)").alias(
                "bucket"
            ),
            rho.alias("rho"),
        )
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


def hll_estimate(registers: list[tuple[int, int]]) -> float:
    """HLL estimate from a (bucket, max_rho) register list.

    Driver-side arithmetic on the tiny merged register table (64
    entries), matching Flajolet et al. 2007: raw harmonic-mean
    estimate with the linear-counting correction for small
    cardinalities. Used by tests to check sketch accuracy against
    exact distinct counts; not part of any oracle-hashed payload.
    """
    rho = {b: r for b, r in registers}
    zeros = HLL_M - len(rho)
    denom = zeros + sum(2.0 ** -r for r in rho.values())
    raw = HLL_ALPHA * HLL_M * HLL_M / denom
    if raw <= 2.5 * HLL_M and zeros:
        return HLL_M * math.log(HLL_M / zeros)
    return raw
