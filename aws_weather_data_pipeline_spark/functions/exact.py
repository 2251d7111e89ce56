"""Exact (order-independent) aggregation helpers.

Summing IEEE doubles is not associative: Spark's partial/final hash
aggregate and DuckDB's parallel aggregate can legally produce different
last-ulp results, which breaks hash-exact oracle comparison AND makes
Spark's own results run-to-run nondeterministic at scale. The fix is the
classic warehouse one (TPC-H itself specifies DECIMAL): cast measures to
DECIMAL before aggregating — decimal addition is exact, hence
order-independent — and cast back to DOUBLE at the serving boundary.

At 100 TB this costs a few % CPU in the aggregate versus raw double
sums, stays entirely inside whole-stage codegen, and buys deterministic,
reproducible results across any cluster size / partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Cast a (double) column to an exact DECIMAL(precision, scale)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    return F.sum(dec(col, scale, precision)).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG as exact-sum / count, returned as double.

    Written as SUM/COUNT (not F.avg) because Spark's decimal AVG widens
    scale by 4 with HALF_UP while DuckDB's decimal AVG returns double —
    this form is the one both engines agree on bit-for-bit.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale, precision)).cast("double") / F.count(c)


def cnt_when(pred: Column) -> Column:
    """Conditional count as SUM(CASE WHEN pred THEN 1 ELSE 0 END).

    The CASE-sum form (not count(when(...))) is the one whose
    null-handling matches the SQL oracles' SUM(CASE...) exactly; ONE
    definition so the convention can't drift between modules.
    """
    return F.sum(F.when(pred, 1).otherwise(0))
