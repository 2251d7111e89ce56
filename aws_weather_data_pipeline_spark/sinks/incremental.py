"""Incremental aggregate maintenance over a table-log change feed.

The materialized-view-maintenance pattern a 100 TB pipeline needs:
a downstream per-group aggregate (counts + sums) kept current by
aggregating each batch's DELTA and folding it into the aggregate
table — never recomputing GROUP BY over the whole source. The source
is a manifest-committed table log (``sinks/tablelog.py``); deltas
come from its change feed, so a batch costs O(new rows) + one
rewrite of the (group-cardinality-sized) aggregate table, while the
naive recompute costs O(source) per refresh — the difference between
an always-fresh dashboard table and a nightly full scan at scale.

Semantics and their limits, stated honestly:

- INSERT-ONLY sources. Counts and sums are self-maintainable under
  inserts alone. Updates/deletes would need before-images the change
  feed does not record (a ``merge`` CDC row carries the new values,
  not the replaced ones), so rewrite commits in the range are
  REFUSED loudly — the same declaration-verification contract as
  ``sync_changes(keys=None)``.
- Exactly-once via the destination log: the consumer position is
  encoded in the destination commit's txn id (``agg-sync:<src
  version>``), committed atomically WITH the folded aggregate, so a
  crashed or retried maintainer resumes from the destination alone
  and a replayed batch is a no-op.
- Single maintainer per (src, dst) pair, like ``vacuum`` and
  ``write_checkpoint``: the fold reads the destination snapshot and
  commits a derived overwrite, a read-modify-write that two
  concurrent maintainers could interleave. Concurrent SOURCE writers
  are fine (they only move the head the next batch will cover).

Reference parity: the reference maintains its Postgres serving
aggregates by re-running full INSERT ... SELECT loads with ON
CONFLICT upserts (airflow/src/load_to_postgres.py) — an O(source)
refresh. This is the log-structured, O(delta) form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import tablelog

#: txn-id namespace for aggregate-maintenance commits; the source
#: version the batch covered rides after the colon (the same
#: destination-recoverable-offset scheme as tablelog.sync_changes).
AGG_TXN_PREFIX = "agg-sync"

#: Reserved name of the per-group row count in the aggregate table.
COUNT_COL = "n_rows"


def aggregate_position(dst_table: str) -> int:
    """Last source version folded into ``dst_table``, or -1 if never.

    Same recovery contract as ``tablelog.sync_position`` (shared
    walk: newest live manifest first, then the checkpoint fold), so
    there is no external cursor to lose."""
    return tablelog.txn_position(dst_table, AGG_TXN_PREFIX)


def _delta_agg(
    changes: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    # sums cast BACK to the declared decimal(28,2): F.sum widens
    # decimal by 10 digits, and the bootstrap commit writes this
    # frame directly — the table schema must not change width between
    # version 0 and every later fold (review r09)
    aggs = [F.count(F.lit(1)).cast("bigint").alias(COUNT_COL)] + [
        F.sum(F.col(c).cast("decimal(28,2)"))
        .cast("decimal(28,2)")
        .alias(f"sum_{c}")
        for c in sum_cols
    ]
    return changes.groupBy(*group_cols).agg(*aggs)


def sync_aggregate(
    spark: SparkSession,
    src_table: str,
    dst_table: str,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
) -> int | None:
    """Fold the source's next change-feed batch into the per-group
    aggregate table ``dst_table``. Returns the destination version
    committed, or None when the source has nothing new.

    The destination schema is ``group_cols + [n_rows] +
    [sum_<c> for c in sum_cols]`` with sums as DECIMAL(28,2) —
    decimal addition is exact and order-independent, so the folded
    table is bit-identical to a from-scratch GROUP BY of the source
    snapshot regardless of how the commits were batched (the
    convergence property the tests pin).

    Plan shape per batch: the delta aggregation is a partial-agg
    shuffle over O(batch) rows; the fold is one outer join of the
    group-cardinality-sized destination against the (usually tiny,
    auto-broadcast) delta, committed as one atomic overwrite. The
    source is never rescanned.
    """
    sum_cols = list(sum_cols or [])
    position = aggregate_position(dst_table)
    head = tablelog.latest_version(src_table)
    if head is None or head <= position:
        return None
    # insert-only declaration, verified before any data moves (the
    # shared check — counts/sums cannot be maintained without
    # before-images; recompute the aggregate for rewritten sources)
    tablelog.verify_insert_only(src_table, position, head)
    changes = tablelog.read_changes(spark, src_table, position, head)
    if changes is None:  # only compactions landed
        return None
    delta = _delta_agg(
        changes.drop("_change_type", "_commit_version"),
        group_cols,
        sum_cols,
    )
    txn = f"{AGG_TXN_PREFIX}:{head}"
    if tablelog.latest_version(dst_table) is None:
        return tablelog.append(delta, dst_table, txn_id=txn)
    current = tablelog.read_snapshot(spark, dst_table)
    measure_cols = [COUNT_COL] + [f"sum_{c}" for c in sum_cols]
    # NULL-SAFE join keys: GROUP BY puts all NULL keys in one group,
    # but an equi-join would never match the existing NULL-group row,
    # appending a duplicate per batch instead of folding (review r09
    # — the same pitfall merge_changes documents for its keys)
    cond = None
    for g in group_cols:
        eq = F.col(f"a.{g}").eqNullSafe(F.col(f"b.{g}"))
        cond = eq if cond is None else cond & eq
    combined = current.alias("a").join(
        F.broadcast(delta).alias("b"), cond, "full_outer"
    ).select(
        *[F.coalesce(f"a.{g}", f"b.{g}").alias(g) for g in group_cols],
        *[
            (
                F.coalesce(F.col(f"a.{m}"), F.lit(0))
                + F.coalesce(F.col(f"b.{m}"), F.lit(0))
            ).alias(m)
            for m in measure_cols
        ],
    )
    # cast sums back to the declared exact type (coalesce+add can
    # widen decimal precision; the table schema must stay stable)
    combined = combined.select(
        *group_cols,
        F.col(COUNT_COL).cast("bigint").alias(COUNT_COL),
        *[
            F.col(f"sum_{c}").cast("decimal(28,2)").alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return tablelog.overwrite(combined, dst_table, txn_id=txn)
