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
- Single maintainer per (src, dst) pair — ENFORCED, not assumed
  (review r10): the fold is a read-modify-write, so each overwrite
  carries ``require_head`` (the destination head the snapshot was
  read at) and each bootstrap append carries ``require_head=-1``;
  a racing maintainer loses with CommitConflict instead of silently
  dropping the other's fold, and a retry re-reads the position and
  folds exactly once. Concurrent SOURCE writers are fine (they only
  move the head the next batch will cover).

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


def aggregate_position(dst_table: str, upto: int | None = None) -> int:
    """Last source version folded into ``dst_table``, or -1 if never.

    Same recovery contract as ``tablelog.sync_position`` (shared
    walk: newest live manifest first, then the checkpoint fold), so
    there is no external cursor to lose. ``upto`` bounds the walk to
    manifests <= that version — ``sync_aggregate`` reads the
    destination HEAD first and derives the position from that same
    snapshot, so a competing fold committing between the two reads
    cannot pair a stale position with a CAS target that already
    covers its commit (review r10: position-before-head read order
    let exactly that interleave double-fold an overlapping range)."""
    return tablelog.txn_position(dst_table, AGG_TXN_PREFIX, upto)


def _delta_agg(
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    min_cols: list[str],
    max_cols: list[str],
) -> DataFrame:
    # sums at decimal(38,2), Spark's maximum precision (review r10:
    # at the old 28,2 a 26-integer-digit accumulated sum overflowed
    # the cast-back to NULL under non-ANSI SQL, and the NEXT fold's
    # F.sum silently ignored the NULL — resetting the group's history
    # to just the new delta; at 38,2 F.sum cannot widen further, the
    # cast is a type pin, and overflow needs 10^36 — unreachable).
    # The bootstrap commit writes this frame directly, so the schema
    # must not change width between version 0 and later folds
    # (review r09). MIN/MAX keep the source column type (no widening).
    aggs = (
        [F.count(F.lit(1)).cast("bigint").alias(COUNT_COL)]
        + [
            F.sum(F.col(c).cast("decimal(38,2)"))
            .cast("decimal(38,2)")
            .alias(f"sum_{c}")
            for c in sum_cols
        ]
        + [F.min(c).alias(f"min_{c}") for c in min_cols]
        + [F.max(c).alias(f"max_{c}") for c in max_cols]
    )
    return changes.groupBy(*group_cols).agg(*aggs)


def sync_aggregate(
    spark: SparkSession,
    src_table: str,
    dst_table: str,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> int | None:
    """Fold the source's next change-feed batch into the per-group
    aggregate table ``dst_table``. Returns the destination version
    committed, or None when the source has nothing new.

    The destination schema is ``group_cols + [n_rows] +
    [sum_<c>] + [min_<c>] + [max_<c>]`` with sums as DECIMAL(38,2) —
    decimal addition is exact and order-independent, so the folded
    table is bit-identical to a from-scratch GROUP BY of the source
    snapshot regardless of how the commits were batched (the
    convergence property the tests pin). MIN/MAX are foldable for
    the same reason counts and sums are: the INSERT-ONLY contract —
    a delete could retract the current extremum, which no fold can
    recover without the full history, but inserts only ever improve
    it (min of mins / max of maxes is exact; AVG falls out as
    sum/n_rows downstream).

    Plan shape per batch: the delta aggregation is a partial-agg
    shuffle over O(batch) rows; the fold unions the
    group-cardinality-sized destination with the delta and
    re-aggregates — one partial-agg hash shuffle, no join — committed
    as one atomic overwrite. The source is never rescanned.
    """
    sum_cols = list(sum_cols or [])
    min_cols = list(min_cols or [])
    max_cols = list(max_cols or [])
    # Destination head FIRST, then the position derived only from
    # manifests <= that head — one consistent snapshot, the
    # sync_changes shape (review r10: reading the position before the
    # head let a fold committed between the two reads pass the CAS
    # with a stale position, double-folding the overlapping range;
    # with head-first reads that racer either lands before the
    # snapshot — and its fold is IN the position — or after it, and
    # the CAS below fails this worker into a clean retry).
    dst_head = tablelog.latest_version(dst_table)
    position = aggregate_position(dst_table, upto=dst_head)
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
        min_cols,
        max_cols,
    )
    txn = f"{AGG_TXN_PREFIX}:{head}"
    # Compare-and-set on the destination head read ABOVE (the same
    # snapshot the position came from — review r10): the fold is a
    # read-modify-write, and two concurrent maintainers at DIFFERENT
    # source heads carry distinct txn ids, so replay dedup alone
    # cannot catch the interleave — without the CAS the second
    # overwrite would silently discard the first fold, and without
    # the head-first read order a fold landing between the position
    # read and the head read would pass the CAS with a stale
    # position. require_head turns both into CommitConflict; the
    # retry re-reads position and head, so the surviving maintainer
    # folds the union exactly once. (Same shape as sync_changes.)
    if dst_head is None:
        return tablelog.append(delta, dst_table, txn_id=txn, require_head=-1)
    # pinned to the SAME head the CAS below checks (review r10): an
    # unpinned read could see a competing fold's newer snapshot and
    # then pay the whole union+re-aggregate+data write only to lose
    # the guaranteed CommitConflict — correctness comes from the CAS,
    # but the read must match the snapshot the fold claims to extend
    current = tablelog.read_snapshot(spark, dst_table, version=dst_head)
    # Fold = union + re-aggregate, NOT a join (review r10: the old
    # full-outer join could never broadcast — Spark rejects the hint
    # for full outer — so it silently ran as a sort-merge join; the
    # union re-aggregate is one partial-agg hash shuffle over
    # |aggregate| + |delta| rows, the plan a 100 TB fold wants). The
    # semantics fall out of SUM itself: NULL group keys collapse to
    # one group (no null-safe-join condition needed), an all-NULL
    # sum stays NULL (SUM over NULLs is NULL — coalescing to 0 would
    # diverge from the from-scratch GROUP BY the convergence contract
    # promises), and a NULL side against a value adds as SUM's
    # ignore-NULLs. Sums cast back to the declared decimal(38,2)
    # (SUM widens by 10 digits; the table schema must stay stable).
    measure_cols = (
        [COUNT_COL]
        + [f"sum_{c}" for c in sum_cols]
        + [f"min_{c}" for c in min_cols]
        + [f"max_{c}" for c in max_cols]
    )
    combined = (
        current.select(*group_cols, *measure_cols)
        .unionByName(delta)
        .groupBy(*group_cols)
        .agg(
            F.sum(COUNT_COL).cast("bigint").alias(COUNT_COL),
            *[
                F.sum(f"sum_{c}")
                .cast("decimal(38,2)")
                .alias(f"sum_{c}")
                for c in sum_cols
            ],
            *[
                F.min(f"min_{c}").alias(f"min_{c}")
                for c in min_cols
            ],
            *[
                F.max(f"max_{c}").alias(f"max_{c}")
                for c in max_cols
            ],
        )
    )
    return tablelog.overwrite(
        combined, dst_table, txn_id=txn, require_head=dst_head
    )
