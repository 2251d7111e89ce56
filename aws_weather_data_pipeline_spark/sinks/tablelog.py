"""Manifest-committed table log: atomic, snapshot-isolated parquet
tables (the missing transactional layer under S7/S11/S12).

Why the sinks in ``writers.py``/``maintenance.py`` are not enough at
100 TB: every one of them publishes by DIRECTORY LISTING — a reader
discovers the table's files by listing the path, so a reader that
lists while a compaction swaps directories, an overwrite deletes
part-files, or a half-failed append leaves orphans sees a torn table.
``compact_path`` narrows the window with a rename dance + crash
marker; this module removes the window entirely with the (public)
log-structured table idea behind Delta Lake and Iceberg:

- Data files are IMMUTABLE and uniquely named under ``data/``. No
  operation ever modifies or deletes a live data file.
- The table's contents are defined by a MANIFEST — a JSON file
  ``_log/{version:016d}.json`` listing exactly the data files of that
  snapshot. Readers resolve the latest manifest and read ONLY the
  files it names: files not yet committed are invisible, files being
  replaced stay readable. A crash before commit leaves orphans that
  ``vacuum`` removes; it can never corrupt the table.
- Commits are ATOMIC and OPTIMISTICALLY CONCURRENT: the manifest is
  written to a temp name and published with ``os.link`` — creating
  version N fails with EEXIST if another writer got there first, and
  the loser re-reads the new head and rebases (append/compact) or
  aborts (blind overwrite). On a POSIX filesystem link-if-absent is
  atomic; on an object store the same protocol needs the store's
  put-if-absent primitive (S3 conditional PUT, GCS generation
  preconditions) — the seam is ``_publish``.
- Old manifests are retained, so any historical version is readable
  (``read_snapshot(version=k)`` — time travel) until ``vacuum``
  drops its files.
- Writer retries are made idempotent with an application transaction
  id recorded in the manifest: replaying a committed ``txn_id`` is a
  no-op, the exactly-once contract a foreachBatch epoch or an Airflow
  retry needs (the log-level form of S11's anti-join idempotence).

Scale shape: a manifest is O(number of live files) — ~100k files at
100 TB is a few MB of JSON, read once per query by the driver; the
data plane is untouched (readers still get parquet row-group pruning
and column projection on the listed files). Version resolution lists
``_log/`` (cheap: one small dir); the growth path past ~1e5 commits
is the standard log checkpoint (fold old manifests into one), noted
on ``history``. Commit latency is one small file write + one link —
independent of table size, which is the whole point: compacting a
10 TB table commits in milliseconds, not in a window proportional to
the rename of millions of objects.

The reference has no transactional story at all — its S3 zones are
bare directory listings (scripts/kinesis_to_s3.py:205-252) and its
only conflict handling is row-level ``ON CONFLICT`` in Postgres
(airflow/src/load_to_postgres.py:294-321); this module is the
equivalent guarantee at object-store scale.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer committed the version this writer targeted."""


#: Retry budget for rebasable commits (append/compact) losing the
#: publish race. Conflicts are per-table and resolution is one small
#: JSON read, so a handful of retries rides out realistic contention;
#: past that, something is misconfigured (e.g. an unbounded writer
#: fleet on one table) and failing loudly beats spinning.
MAX_COMMIT_RETRIES = 10


def _log_dir(table: str) -> str:
    return os.path.join(table, "_log")


def _data_dir(table: str) -> str:
    return os.path.join(table, "data")


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(_log_dir(table), f"{version:016d}.json")


def _list_versions(table: str) -> list[int]:
    log = _log_dir(table)
    if not os.path.isdir(log):
        return []
    return sorted(
        int(name[:-5])
        for name in os.listdir(log)
        if name.endswith(".json") and name[:-5].isdigit()
    )


def latest_version(table: str) -> int | None:
    """Current head version, or None for a not-yet-created table."""
    versions = _list_versions(table)
    return versions[-1] if versions else None


def _read_manifest(table: str, version: int) -> dict:
    with open(_manifest_path(table, version)) as fh:
        return json.load(fh)


def _publish(table: str, version: int, manifest: dict) -> None:
    """Atomically create manifest ``version`` or raise CommitConflict.

    write-temp + link-if-absent: ``os.link`` to an existing path
    raises, so exactly one writer wins each version — the object-store
    port swaps this one function for a conditional PUT.
    """
    os.makedirs(_log_dir(table), exist_ok=True)
    final = _manifest_path(table, version)
    tmp = os.path.join(_log_dir(table), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise CommitConflict(
            f"version {version} of {table} was committed concurrently"
        ) from None
    finally:
        os.unlink(tmp)


def _write_data_files(df: DataFrame, table: str) -> list[str]:
    """Materialize ``df`` as immutable uniquely-named files in data/.

    Spark owns its output directory, so write to a throwaway staging
    dir first, then move each part-file to ``data/`` under a fresh
    uuid name (same-filesystem rename — metadata-only; the object-
    store port writes direct to unique keys and skips the move).
    Files are INVISIBLE to every reader until a manifest names them.
    """
    os.makedirs(_data_dir(table), exist_ok=True)
    staging = os.path.join(table, f"_staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    names = []
    for part in sorted(os.listdir(staging)):
        if not part.endswith(".parquet"):
            continue
        name = f"{uuid.uuid4().hex}.parquet"
        os.rename(
            os.path.join(staging, part), os.path.join(_data_dir(table), name)
        )
        names.append(name)
    for leftover in os.listdir(staging):
        os.unlink(os.path.join(staging, leftover))
    os.rmdir(staging)
    return names


def _commit(
    table: str,
    build_files,
    op: str,
    txn_id: str | None,
    rebase: bool,
) -> int:
    """Run one optimistic commit round: resolve head, build the new
    file list from it, publish head+1; on a lost race either rebase
    (re-resolve and retry) or raise. Returns the committed version,
    or the already-committed version for a replayed ``txn_id``.
    """
    for _ in range(MAX_COMMIT_RETRIES):
        head = latest_version(table)
        if txn_id is not None and head is not None:
            for v in reversed(_list_versions(table)):
                m = _read_manifest(table, v)
                if m.get("txn_id") == txn_id:
                    return v  # replayed retry: already committed
        prev_files = (
            _read_manifest(table, head)["files"] if head is not None else []
        )
        manifest = {
            "version": (head if head is not None else -1) + 1,
            "op": op,
            "files": build_files(prev_files),
            "txn_id": txn_id,
        }
        try:
            _publish(table, manifest["version"], manifest)
            return manifest["version"]
        except CommitConflict:
            if not rebase:
                raise
    raise CommitConflict(
        f"{op} on {table} lost the publish race {MAX_COMMIT_RETRIES} "
        "times; check for a runaway writer fleet"
    )


def append(df: DataFrame, table: str, txn_id: str | None = None) -> int:
    """Commit ``df`` as new files added to the current snapshot.

    Rebasable: losing the publish race just re-reads the head and
    re-targets — the data files are already written and file lists
    merge trivially. ``txn_id`` makes retries exactly-once.
    """
    new = _write_data_files(df, table)
    return _commit(
        table, lambda prev: prev + new, "append", txn_id, rebase=True
    )


def overwrite(df: DataFrame, table: str, txn_id: str | None = None) -> int:
    """Commit ``df`` as the table's entire new contents.

    NOT rebasable: a blind overwrite that lost a race would silently
    discard the interleaved commit, so the conflict propagates and the
    caller decides (recompute-and-retry is the honest resolution).
    Old versions stay readable until vacuum.
    """
    new = _write_data_files(df, table)
    return _commit(
        table, lambda prev: new, "overwrite", txn_id, rebase=False
    )


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read an exact committed snapshot (latest by default).

    The file list is resolved ONCE, here, from one manifest — the
    returned frame can be re-evaluated, cached, or joined while any
    number of commits/compactions land, and it always shows this
    version's rows. Empty-file-list snapshots need a schema source, so
    they read the parquet footers of version 0's... there are none:
    raise instead of guessing a schema.
    """
    if version is None:
        version = latest_version(table)
        if version is None:
            raise FileNotFoundError(f"no commits in table {table}")
    manifest = _read_manifest(table, version)
    paths = [
        os.path.join(_data_dir(table), name) for name in manifest["files"]
    ]
    if not paths:
        raise ValueError(
            f"version {version} of {table} is empty; no schema to read"
        )
    return spark.read.parquet(*paths)


def compact(
    spark: SparkSession, table: str, n_files: int, txn_id: str | None = None
) -> int:
    """Rewrite the current snapshot as ``n_files`` files, atomically.

    coalesce (never repartition — compaction concatenates, it must not
    shuffle), write the merged files, commit them as the new snapshot.
    Readers of any in-flight version are untouched: their files are
    still on disk until vacuum. Lost races rebase by RE-COMPACTING the
    new head (files appended meanwhile must not be dropped), which
    re-runs the job — correct first, and rare enough not to matter.
    """
    for _ in range(MAX_COMMIT_RETRIES):
        head = latest_version(table)
        if head is None:
            raise FileNotFoundError(f"no commits in table {table}")
        merged = _write_data_files(
            read_snapshot(spark, table, head).coalesce(n_files), table
        )
        manifest = {
            "version": head + 1,
            "op": "compact",
            "files": merged,
            "txn_id": txn_id,
        }
        try:
            _publish(table, head + 1, manifest)
            return head + 1
        except CommitConflict:
            continue  # head moved: orphan `merged`, re-compact new head
    raise CommitConflict(f"compact on {table} kept losing the race")


def history(table: str) -> list[dict]:
    """All committed manifests, oldest first (the audit/debug view).

    O(commits) small-file reads; the >1e5-commit growth path is the
    standard log checkpoint — fold a prefix of manifests into one and
    let this walk start there.
    """
    return [_read_manifest(table, v) for v in _list_versions(table)]


def vacuum(table: str, retain_last: int = 1) -> list[str]:
    """Delete data files unreachable from the newest ``retain_last``
    manifests, and the expired manifests themselves.

    This is the ONLY deletion in the protocol, and it only touches
    files no retained snapshot can name — crash-orphaned files (data
    written, commit never published) are unreachable by construction
    and swept too. Returns deleted data-file names. ``retain_last``
    must keep at least the head: vacuuming the live version is
    nonsense and refused.
    """
    if retain_last < 1:
        raise ValueError("retain_last must keep at least the head version")
    versions = _list_versions(table)
    if not versions:
        return []
    keep_versions = versions[-retain_last:]
    live: set[str] = set()
    for v in keep_versions:
        live.update(_read_manifest(table, v)["files"])
    deleted = []
    data = _data_dir(table)
    if os.path.isdir(data):
        for name in sorted(os.listdir(data)):
            if name.endswith(".parquet") and name not in live:
                os.unlink(os.path.join(data, name))
                deleted.append(name)
    for v in versions[:-retain_last]:
        os.unlink(_manifest_path(table, v))
    return deleted
