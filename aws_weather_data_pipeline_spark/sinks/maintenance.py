"""Lake maintenance: small-file compaction and pruning-friendly layout.

Two operators every long-running lake needs that no query surface
shows:

- **Compaction.** Streaming sinks and idempotent appends accrete files
  (one per micro-batch × partition); at 100 TB a day's partition can
  hold 10⁴+ tiny files, and scan cost becomes file-open dominated
  (driver-side listing + one footer read each) long before byte count
  matters. ``compact_path`` rewrites a partition directory into
  size-targeted files via a staging directory + atomic swap, so
  readers never observe a half-compacted partition.
- **Sorted layout.** Parquet row-group min/max statistics only prune
  when values are clustered; ``write_sorted`` sorts WITHIN partitions
  by the hot filter key before writing (``sortWithinPartitions`` — a
  local sort, no exchange beyond the explicit repartition), so a
  point/range predicate on that key skips most row groups. This is
  the poor-man's Z-ORDER: one clustering key, zero extra
  infrastructure.

Both take a target size, not a file count: the right file count is a
function of data volume, which the caller doesn't know at 100 TB.
Reference parity: the reference's lake (S3 JSON/parquet zones) has no
maintenance story at all — files accumulate forever; this module is
the operational completion of its S7-S12 sink surface.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Compaction default: aim for files this size on disk.
TARGET_FILE_BYTES = 128 << 20


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if not f.startswith(("_", "."))
        )
    return total


def compact_path(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> tuple[int, int]:
    """Rewrite the parquet files under ``path`` into ≈target-size files.

    Returns (files_before, files_after). The rewrite goes to a
    DOT-PREFIXED staging sibling (hidden from Spark/Hive file
    listing, so a reader of the parent table never discovers it as a
    phantom partition), then swaps in via two renames. The swap is
    NOT atomic: between the two renames the path briefly does not
    exist, and a query planned against the old file set fails after
    the cleanup — plain filesystems cannot do better (an atomic
    multi-file swap needs a table format's metadata commit: Iceberg/
    Delta, which is what a production deployment puts in front of
    this). Run it in a write-quiesced maintenance window, per
    partition. File count = ceil(bytes/target), with compressed size
    as the estimator (both sides of the ratio are parquet, so the
    on-disk estimate is the right one, unlike the common
    rows-per-file guess).

    Crash recovery (ADVICE r06): because staging/old names are
    dot-prefixed, a crash between the two renames would otherwise
    leave NO visible table at ``path`` and no visible clue where the
    data went. So before the first rename a VISIBLE marker file
    ``_COMPACTING_{base}`` is written in the parent naming both
    hidden directories; it is removed only after the swap completes
    and the old copy is deleted. The marker's embedded instructions
    cover every crash point: ``path`` missing → rename ``old`` back;
    ``path`` present with ``old`` on disk → the swap completed, the
    leftover is the hidden old copy, delete ``old``; ``path`` present
    without ``old`` → crash before the swap, delete ``staging``
    (ADVICE r07 closed the middle case — previously the note said to
    delete ``staging``, which no longer exists there, leaking a full
    table copy). A new run REFUSES to start while a stale marker
    exists, so a prior crash's pointers are never overwritten.

    Scope it to ONE partition directory (a day, an hour) and run it
    partition-parallel from the orchestrator — compacting a whole
    100 TB table as one job would shuffle the world; compacting the
    partitions the last load touched is O(new data).
    """
    before = [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    n_files = max(1, -(-_dir_bytes(path) // target_file_bytes))
    parent, base = os.path.split(os.path.normpath(path))
    # A pre-existing marker means a PRIOR compaction crashed and was
    # never recovered: its hidden dirs (a leaked full table copy, or
    # the live data itself) are still pointed to only by this file.
    # Overwriting it would orphan them silently — refuse and make the
    # operator run the marker's recovery steps first (ADVICE r07).
    marker = os.path.join(parent, f"_COMPACTING_{base}")
    if os.path.exists(marker):
        with open(marker) as fh:
            prior = fh.read()
        raise RuntimeError(
            f"refusing to compact {path}: crash marker {marker} "
            "already exists from an unrecovered prior run — follow "
            f"its recovery steps, then delete it:\n{prior}"
        )
    staging = os.path.join(
        parent, f".{base}__compacting_{uuid.uuid4().hex[:8]}"
    )
    # coalesce, not repartition: compaction must not shuffle — it only
    # concatenates existing partitions into fewer write tasks.
    spark.read.parquet(path).coalesce(n_files).write.mode(
        "overwrite"
    ).parquet(staging)
    old = os.path.join(parent, f".{base}__old_{uuid.uuid4().hex[:8]}")
    # Visible crash-recovery breadcrumb: written BEFORE the swap so a
    # crash mid-swap (path absent, data only in hidden dirs) is
    # diagnosable from a plain directory listing. The instructions
    # cover every crash point, including between the second rename and
    # the old-copy delete (table present + `old` still on disk —
    # ADVICE r07). See docstring.
    with open(marker, "w") as fh:
        fh.write(
            "compaction in progress\n"
            f"table:   {path}\n"
            f"old:     {old}\n"
            f"staging: {staging}\n"
            "recovery:\n"
            "  - table dir MISSING: the swap half-completed — rename "
            "`old` back to `table`, then delete `staging` if present.\n"
            "  - table present and `old` exists: the swap COMPLETED "
            "(the table is the compacted data) — delete `old`.\n"
            "  - table present, no `old`: crash before the swap — "
            "delete `staging`.\n"
            "then delete this marker file.\n"
        )
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    os.remove(marker)
    after = [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    return len(before), len(after)


def write_sorted(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int | None = None,
) -> None:
    """Write parquet clustered by ``cluster_col`` for row-group pruning.

    ``repartition(cluster_col)`` ranges co-locate equal keys, then
    ``sortWithinPartitions`` orders them locally (no extra exchange),
    so each row group's min/max stats cover a narrow key range and a
    reader's key predicate skips the rest. The sort is the cheap,
    per-task kind — at 100 TB the win is read-side: every downstream
    query with a ``cluster_col`` predicate scans a fraction of the
    row groups forever after.
    """
    out = (
        df.repartition(n_files, cluster_col)
        if n_files
        else df.repartition(F.col(cluster_col))
    )
    out.sortWithinPartitions(cluster_col).write.mode(
        "overwrite"
    ).parquet(path)
