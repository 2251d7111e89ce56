"""Streaming tests (T1-T6): the one-code-path property and checkpointing.

The key invariant (SURVEY §7.1): the streaming pipeline applies the SAME
transform functions as the batch path, so draining a landing directory
through the stream must produce byte-equal results to reading the same
files in batch.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_weather_data_pipeline_spark.functions.weather import (
    apply_transformations,
)
from aws_weather_data_pipeline_spark.sources.readers import read_raw_json
from aws_weather_data_pipeline_spark.streaming.pipeline import (
    alerts_view,
    start_pipeline,
)
from tests.weather_fixtures import make_reading, write_batch_file


def _sorted_rows(df, cols=("station_id", "timestamp")):
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_stream_equals_batch_two_sinks(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    write_batch_file(
        landing / "batch_001.json", [make_reading(i) for i in range(10)]
    )
    write_batch_file(
        landing / "batch_002.json",
        [make_reading(i, hour=11) for i in range(10, 25)],
    )

    processed_path = str(tmp_path / "processed")
    alerts_path = str(tmp_path / "alerts")
    q = start_pipeline(
        spark,
        str(landing),
        processed_path,
        alerts_path,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    batch = apply_transformations(read_raw_json(spark, str(landing)))
    got_processed = spark.read.parquet(processed_path).drop(
        "year", "month", "day", "hour", "epoch_id"
    )
    # Same columns, same rows (order-insensitive).
    assert set(got_processed.columns) == set(batch.columns)
    assert _sorted_rows(
        got_processed.select(*sorted(got_processed.columns))
    ) == _sorted_rows(batch.select(*sorted(batch.columns)))

    got_alerts = spark.read.parquet(alerts_path).drop("epoch_id")
    want_alerts = alerts_view(batch)
    assert want_alerts.count() > 0  # fixture must actually trigger alerts
    assert _sorted_rows(
        got_alerts.select(*sorted(got_alerts.columns))
    ) == _sorted_rows(want_alerts.select(*sorted(want_alerts.columns)))


def test_checkpoint_reset_does_not_clobber_previous_epochs(
    spark, tmp_path
):
    """Review r11: epoch ids restart at 0 per checkpoint, so a
    checkpoint reset (or a second stream sharing the sink) used to
    land in the SAME epoch-0 partitions and dynamic overwrite deleted
    the previous run's rows. The checkpoint-lifetime namespace keeps
    every run's epoch partitions disjoint."""
    from aws_weather_data_pipeline_spark.streaming.pipeline import (
        start_pipeline,
    )

    landing1, landing2 = tmp_path / "l1", tmp_path / "l2"
    landing1.mkdir(), landing2.mkdir()
    write_batch_file(
        landing1 / "a.json", [make_reading(i) for i in range(5)]
    )
    write_batch_file(
        landing2 / "b.json", [make_reading(i, hour=11) for i in range(5, 9)]
    )
    processed = str(tmp_path / "processed")
    alerts = str(tmp_path / "alerts")
    start_pipeline(
        spark, str(landing1), processed, alerts, str(tmp_path / "ck1")
    ).awaitTermination(120)
    n1 = spark.read.parquet(processed).count()
    assert n1 == 5
    # fresh checkpoint, same sink: its epoch 0 must coexist with run 1's
    start_pipeline(
        spark, str(landing2), processed, alerts, str(tmp_path / "ck2")
    ).awaitTermination(120)
    got = spark.read.parquet(processed)
    assert got.count() == 9, "run 2's epoch 0 deleted run 1's rows"
    assert got.select("epoch_id").distinct().count() == 2


def test_stream_sees_nested_landing_subdirectories(spark, tmp_path):
    """Review r11: the raw zone nests files under date prefixes
    (kinesis_to_s3.py layout); the stream must list them like the
    batch twin does, not silently process nothing."""
    from aws_weather_data_pipeline_spark.streaming.pipeline import (
        start_pipeline,
    )

    landing = tmp_path / "landing"
    nested = landing / "2024" / "01" / "15"
    nested.mkdir(parents=True)
    write_batch_file(
        nested / "batch.json", [make_reading(i) for i in range(4)]
    )
    processed = str(tmp_path / "processed")
    start_pipeline(
        spark, str(landing), processed, str(tmp_path / "alerts"),
        str(tmp_path / "ckpt"),
    ).awaitTermination(120)
    assert spark.read.parquet(processed).count() == 4


def test_checkpoint_namespace_resolves_uri_schemes(spark, tmp_path):
    """Review r11: checkpoint locations are Hadoop URIs — a scheme'd
    location resolves its marker through the checkpoint's own
    filesystem (exercised here via file:, the Hadoop LocalFileSystem),
    staying stable across calls and rotating with the directory."""
    from aws_weather_data_pipeline_spark.streaming.pipeline import (
        _checkpoint_namespace,
    )

    uri = "file:" + str(tmp_path / "ck_uri")
    ns1 = _checkpoint_namespace(uri, spark)
    assert ns1 and _checkpoint_namespace(uri, spark) == ns1
    assert _checkpoint_namespace(
        "file:" + str(tmp_path / "ck_other"), spark
    ) != ns1
    # the marker lives INSIDE the checkpoint dir on the target FS
    assert (tmp_path / "ck_uri" / ".tablelog-namespace").exists()


def test_stream_checkpoint_resume_no_duplicates(spark, tmp_path):
    # T3: restarting against the same checkpoint must process only new
    # files — no re-emission of already-committed batches.
    landing = tmp_path / "landing"
    landing.mkdir()
    write_batch_file(
        landing / "batch_001.json", [make_reading(i) for i in range(5)]
    )
    args = (
        str(landing),
        str(tmp_path / "processed"),
        str(tmp_path / "alerts"),
        str(tmp_path / "ckpt"),
    )
    q = start_pipeline(spark, *args)
    q.awaitTermination(120)
    n1 = spark.read.parquet(args[1]).count()
    assert n1 == 5

    write_batch_file(
        landing / "batch_002.json",
        [make_reading(i, hour=12) for i in range(5, 8)],
    )
    q2 = start_pipeline(spark, *args)
    q2.awaitTermination(120)
    out = spark.read.parquet(args[1])
    assert out.count() == 8  # 5 old (not duplicated) + 3 new
    assert out.select("station_id").distinct().count() == 8


def test_partitioned_lake_layout_from_stream(spark, tmp_path):
    import os

    landing = tmp_path / "landing"
    landing.mkdir()
    write_batch_file(
        landing / "b.json",
        [make_reading(0, hour=9), make_reading(1, hour=10)],
    )
    processed = str(tmp_path / "processed")
    q = start_pipeline(
        spark,
        str(landing),
        processed,
        str(tmp_path / "alerts"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    base = os.path.join(processed, "year=2024", "month=01", "day=15")
    assert sorted(os.listdir(base)) == ["hour=09", "hour=10"]
    # Pruned read touches one partition only.
    one = spark.read.parquet(processed).filter(F.col("hour") == "09")
    assert one.count() == 1


def test_write_both_sinks_replay_is_idempotent(spark, tmp_path):
    # Crash-replay semantics: foreachBatch re-runs a micro-batch with
    # the SAME epoch id; both sinks must converge to one copy.
    from aws_weather_data_pipeline_spark.streaming.pipeline import (
        write_both_sinks,
    )

    batch = apply_transformations(
        read_raw_json_fixture(spark, tmp_path)
    )
    processed, alerts = str(tmp_path / "p"), str(tmp_path / "a")
    write_both_sinks(batch, processed, alerts, epoch_id=7)
    n1 = spark.read.parquet(processed).count()
    a1 = spark.read.parquet(alerts).count()
    # Replay of the same epoch (e.g. crash between the two writes).
    write_both_sinks(batch, processed, alerts, epoch_id=7)
    assert spark.read.parquet(processed).count() == n1
    assert spark.read.parquet(alerts).count() == a1
    # A genuinely new epoch appends.
    write_both_sinks(batch, processed, alerts, epoch_id=8)
    assert spark.read.parquet(processed).count() == 2 * n1


def read_raw_json_fixture(spark, tmp_path):
    landing = tmp_path / "fixture_raw"
    landing.mkdir()
    write_batch_file(
        landing / "b.json", [make_reading(i) for i in range(8)]
    )
    return read_raw_json(spark, str(landing))


def test_quarantine_sidecar_captures_malformed_envelopes(
    spark, tmp_path
):
    """The DLQ companion query must capture a truncated landing file's
    original bytes while the main pipeline processes the good file
    unaffected — no silent drops, no poisoned hot path."""
    import json as _json

    from aws_weather_data_pipeline_spark.streaming.pipeline import (
        start_pipeline,
        start_quarantine_stream,
    )
    from tests.weather_fixtures import make_reading

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "good.json").write_text(
        _json.dumps({"readings": [make_reading(0)]}, indent=2)
    )
    bad = '{"readings": [{"station_id": "WS9'
    (landing / "truncated.json").write_text(bad)

    q1 = start_pipeline(
        spark,
        str(landing),
        str(tmp_path / "processed"),
        str(tmp_path / "alerts"),
        str(tmp_path / "ckpt_main"),
    )
    q2 = start_quarantine_stream(
        spark,
        str(landing),
        str(tmp_path / "quarantine"),
        str(tmp_path / "ckpt_dlq"),
    )
    q1.awaitTermination(300)
    q2.awaitTermination(300)

    processed = spark.read.parquet(str(tmp_path / "processed"))
    assert processed.count() == 1
    dlq = spark.read.parquet(str(tmp_path / "quarantine")).collect()
    assert len(dlq) == 1
    assert dlq[0]["raw_payload"] == bad


def test_stateful_running_stats_checkpoint_crash_resume(spark, tmp_path):
    """VERDICT r05 #7: checkpoint recovery of applyInPandasWithState
    STATE, not just source offsets. Phase 1 drains file A and the
    query object dies (the crash point — only the checkpoint
    survives). Phase 2 lands file B and a brand-new query resumes
    from the same checkpoint: its state store must reload every
    user's profile, so the merged result equals an uninterrupted run
    over A+B. A cross-phase timestamp TIE pins that the tie-break
    fields (last_ts, last_event_id) really round-trip through the
    checkpointed state, not just the counters."""
    import json

    from aws_weather_data_pipeline_spark.streaming.windows import (
        EVENT_STREAM_SCHEMA,
        running_user_stats,
    )

    landing = tmp_path / "landing"
    landing.mkdir()

    def write_file(name, rows):
        with open(landing / name, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    def ev(eid, ts, uid, etype, value):
        return {
            "event_id": eid, "ts": ts, "user_id": uid,
            "event_type": etype, "value": value,
        }

    file_a = [
        ev(1, "2024-01-01T10:00:00", 1, "view", 5.0),
        ev(5, "2024-01-01T10:30:00", 1, "click", 9.0),
        ev(2, "2024-01-01T10:05:00", 2, "view", 3.0),
    ]
    file_b = [
        # same ts as eid 5 but LOWER event_id: must NOT displace the
        # phase-1 last_event_type (tie resolves to the higher eid,
        # carried in checkpointed state)
        ev(4, "2024-01-01T10:30:00", 1, "purchase", 1.0),
        ev(6, "2024-01-01T11:00:00", 3, "error", 7.0),
    ]

    def drain(outdir, ckpt):
        events = spark.readStream.schema(EVENT_STREAM_SCHEMA).json(
            str(landing)
        )

        def sink(batch_df, epoch_id):
            batch_df.withColumn(
                "batch_id", F.lit(epoch_id).cast("long")
            ).write.mode("append").parquet(outdir)

        q = (
            running_user_stats(events)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    def final_profiles(outdir):
        from pyspark.sql import Window

        u = spark.read.parquet(outdir)
        w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
        return {
            r["user_id"]: (
                r["n_events"], r["max_value"], r["last_event_type"]
            )
            for r in u.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        }

    out_resumed = str(tmp_path / "resumed")
    ckpt = str(tmp_path / "ckpt")
    write_file("a.json", file_a)
    drain(out_resumed, ckpt)          # phase 1, then "crash"
    write_file("b.json", file_b)
    drain(out_resumed, ckpt)          # NEW query, SAME checkpoint

    out_control = str(tmp_path / "control")
    drain(out_control, str(tmp_path / "ckpt_control"))  # uninterrupted

    resumed = final_profiles(out_resumed)
    control = final_profiles(out_control)
    assert resumed == control
    # explicit expectations (not just self-consistency):
    assert resumed[1] == (3, 9.0, "click")   # tie kept phase-1 type
    assert resumed[2] == (1, 3.0, "view")    # untouched state survives
    assert resumed[3] == (1, 7.0, "error")   # new key after resume


def test_stateful_operator_under_rocksdb_state_store(spark, tmp_path):
    """100 TB posture test: production stateful streams run on the
    RocksDB state store provider (off-heap, spillable, incremental
    checkpoints) — the default in-memory provider caps state at
    executor heap. The custom applyInPandasWithState operator must be
    provider-agnostic: the same two-phase drain-with-resume under
    RocksDB yields exactly the default-provider profiles, proving
    both providers serialize/restore the state rows identically."""
    import json

    from aws_weather_data_pipeline_spark.streaming.windows import (
        EVENT_STREAM_SCHEMA,
        running_user_stats,
    )

    landing = tmp_path / "landing"
    landing.mkdir()

    def write_file(name, rows):
        with open(landing / name, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    def ev(eid, ts, uid, etype, value):
        return {
            "event_id": eid, "ts": ts, "user_id": uid,
            "event_type": etype, "value": value,
        }

    file_a = [
        ev(1, "2024-01-01T10:00:00", 1, "view", 5.0),
        ev(2, "2024-01-01T10:05:00", 2, "view", 3.0),
    ]
    file_b = [
        ev(3, "2024-01-01T10:30:00", 1, "click", 9.0),
        ev(4, "2024-01-01T11:00:00", 3, "error", 7.0),
    ]

    def drain(outdir, ckpt):
        events = spark.readStream.schema(EVENT_STREAM_SCHEMA).json(
            str(landing)
        )

        def sink(batch_df, epoch_id):
            batch_df.withColumn(
                "batch_id", F.lit(epoch_id).cast("long")
            ).write.mode("append").parquet(outdir)

        q = (
            running_user_stats(events)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    def final_profiles(outdir):
        from pyspark.sql import Window

        u = spark.read.parquet(outdir)
        w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
        return {
            r["user_id"]: (
                r["n_events"], r["max_value"], r["last_event_type"]
            )
            for r in u.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        }

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prior = spark.conf.get(provider_key, None)
    try:
        spark.conf.set(provider_key, rocksdb)
        write_file("a.json", file_a)
        drain(str(tmp_path / "rocks"), str(tmp_path / "ckpt_rocks"))
        write_file("b.json", file_b)  # resume against RocksDB state
        drain(str(tmp_path / "rocks"), str(tmp_path / "ckpt_rocks"))
    finally:
        if prior is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prior)
    drain(str(tmp_path / "default"), str(tmp_path / "ckpt_default"))

    rocks = final_profiles(str(tmp_path / "rocks"))
    default = final_profiles(str(tmp_path / "default"))
    assert rocks == default
    assert rocks[1] == (2, 9.0, "click")
    assert rocks[2] == (1, 3.0, "view")
    assert rocks[3] == (1, 7.0, "error")


def test_checkpoint_namespace_create_failure_names_root_cause(spark):
    """Review r13: a failed exclusive create used to be swallowed and
    re-surface one second later as 'marker stayed empty; remove it' —
    instructing the operator to remove a file that was never created.
    When no marker ever appears AND our create failed, the create
    error is the diagnosis."""
    import uuid as _uuid

    import pytest

    from aws_weather_data_pipeline_spark.streaming.pipeline import (
        _checkpoint_namespace,
    )

    # an uncreatable location (procfs rejects mkdir even for root)
    bad = f"file:///proc/ns-test-{_uuid.uuid4().hex}/cp"
    with pytest.raises(RuntimeError, match="could not create"):
        _checkpoint_namespace(bad, spark)


def test_checkpoint_namespace_schemeless_follows_default_fs(spark):
    """Review r13: Spark resolves a schemeless checkpointLocation
    against fs.defaultFS, so the namespace marker must live there too
    — with a non-file defaultFS the local os.* fallback would put the
    marker on the driver's local disk, and a failover host would mint
    a fresh namespace and double-commit a replayed epoch. Pin the
    routing: under a (fake, unreachable) hdfs defaultFS the schemeless
    path takes the Hadoop branch (here: fails loudly reaching for the
    fake cluster) instead of silently succeeding locally."""
    import uuid as _uuid

    import pytest

    from aws_weather_data_pipeline_spark.streaming.pipeline import (
        _checkpoint_namespace,
    )

    conf = spark._jsc.hadoopConfiguration()
    old = conf.get("fs.defaultFS", "file:///")
    conf.set("fs.defaultFS", "hdfs://fake-nn:1")
    try:
        with pytest.raises(Exception) as exc:
            _checkpoint_namespace(
                f"/tmp/ns-default-fs-{_uuid.uuid4().hex}/cp", spark
            )
        # the failure must come from reaching for the CLUSTER fs (the
        # fake namenode), not from the local branch succeeding
        assert "fake-nn" in str(exc.value) or "could not create" in str(
            exc.value
        ), exc.value
    finally:
        conf.set("fs.defaultFS", old)


def test_stream_through_tablelog_under_folding_vacuum_with_consumer(
    spark, tmp_path
):
    """VERDICT r13 task 4 — the composition the directory sink's
    epoch-growth note points long-lived streams at, driven as ONE
    seam instead of its tested halves: a Structured Streaming
    pipeline commits micro-batches through the table-log sink
    (``start_tablelog_sink``) across restarts on one checkpoint,
    WHILE checkpoint-folding vacuum maintenance runs — both
    concurrently with the drain (in-contract: data-file deletion
    age-gated by ``min_age_seconds``; manifest expiry + txn folding
    are not age-gated, so they really interleave with live commits)
    and as the deep between-drain maintenance pass — and a
    change-feed consumer (log-to-log ``sync_changes``) tails the
    stream's commits into a downstream log. Asserts: every landed
    row lands EXACTLY once in the table and in the consumer's
    destination; ``_log/`` stays bounded by the vacuum cadence, not
    stream age; the consumer's recovered position survives the
    vacuumed prefix via the checkpoint fold; and a replay of a
    long-expired epoch (manifest vacuumed away) is still recognized
    as a no-op through the fold."""
    import threading

    from aws_weather_data_pipeline_spark.sinks import tablelog as tl
    from aws_weather_data_pipeline_spark.streaming.pipeline import (
        append_epoch_to_tablelog,
        start_tablelog_sink,
    )

    src = str(tmp_path / "landing")
    table = str(tmp_path / "stream_log")
    dst = str(tmp_path / "downstream")
    ckpt = str(tmp_path / "ckpt")

    def _rows(lo, hi):
        return spark.range(lo, hi).withColumnRenamed("id", "v")

    lo, manifest_counts = 0, []
    for phase in range(3):
        hi = lo + 20
        # two files per phase + maxFilesPerTrigger=1 -> >=2 epochs
        _rows(lo, lo + 10).coalesce(1).write.mode("append").parquet(src)
        _rows(lo + 10, hi).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("v bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        # CONCURRENT maintenance while the drain commits: fold +
        # expire manifests beyond retain_last=4; the 1h data-file age
        # horizon keeps in-flight commit staging safe (the documented
        # live-writer contract on vacuum). A second thread TAILS the
        # stream live via sync_changes — consumer, maintainer, and
        # stream writer all interleave on one log (the retention
        # stays deeper than the consumer's poll lag, the documented
        # vacuum-cadence contract).
        stop = threading.Event()
        consumer_errors: list[BaseException] = []

        def maintain():
            while not stop.is_set():
                try:
                    tl.vacuum(table, retain_last=4, min_age_seconds=3600.0)
                except FileNotFoundError:
                    pass  # nothing committed yet this phase
                stop.wait(0.05)

        def tail():
            # NO FileNotFoundError tolerance (review r14): a
            # never-written source is sync_changes' None return, not
            # a raise — the only FileNotFoundError this seam can see
            # is the named behind-retention error, i.e. the exact
            # vacuum-cadence violation this test exists to catch
            while not stop.is_set():
                try:
                    tl.sync_changes(spark, table, dst)
                except tl.CommitConflict:
                    pass  # lost a race: poll again
                except BaseException as exc:  # pragma: no cover
                    consumer_errors.append(exc)
                    return
                stop.wait(0.05)

        maintainer = threading.Thread(target=maintain)
        tailer = threading.Thread(target=tail)
        maintainer.start(), tailer.start()
        q = None
        try:
            q = start_tablelog_sink(stream, table, ckpt)
            # awaitTermination(timeout) returns False on timeout with
            # the query STILL RUNNING — unchecked, a slow host would
            # cascade into confusing phase/catch-up assertion failures
            # instead of this one clear message (ADVICE r14)
            assert q.awaitTermination(120), (
                "streaming drain did not terminate within 120s"
            )
        finally:
            if q is not None:
                q.stop()
            stop.set()
            maintainer.join(), tailer.join()
        assert not consumer_errors, consumer_errors
        lo = hi
        # catch-up sync (the live tailer may or may not have drained
        # the final commits): after it, the destination holds every
        # committed row exactly once
        tl.sync_changes(spark, table, dst)
        assert sorted(
            r.v for r in tl.read_snapshot(spark, dst).collect()
        ) == list(range(hi))
        assert tl.sync_position(dst, table) == tl.latest_version(table)
        assert tl.sync_changes(spark, table, dst) is None  # drained
        # deep between-drain maintenance (the documented cadence:
        # right after the sync, nothing unsynced behind retention)
        tl.vacuum(table, retain_last=2, min_age_seconds=0.0)
        manifest_counts.append(len(tl._list_versions(table)))
    # exactly-once end to end: each landed row once, in both logs
    assert sorted(
        r.v for r in tl.read_snapshot(spark, table).collect()
    ) == list(range(lo))
    assert sorted(
        r.v for r in tl.read_snapshot(spark, dst).collect()
    ) == list(range(lo))
    # _log/ bounded by the vacuum cadence, not by stream age: 6+
    # stream epochs have committed, at most retain_last manifests live
    assert max(manifest_counts) <= 2
    # the consumer's position outlives the vacuumed prefix (the
    # checkpoint fold carries it; sync stays idle, no re-apply)
    assert tl.sync_position(dst, table) == tl.latest_version(table)
    # replay of the FIRST epoch — manifest long vacuumed — is still a
    # no-op: its txn id lives in the fold, not the expired manifest
    ns = (
        open(os.path.join(ckpt, ".tablelog-namespace")).read().strip()
    )
    head = tl.latest_version(table)
    append_epoch_to_tablelog(_rows(0, 10), table, 0, ns)
    assert tl.latest_version(table) == head
    assert sorted(
        r.v for r in tl.read_snapshot(spark, table).collect()
    ) == list(range(lo))
