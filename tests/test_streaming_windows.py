"""Streaming window + stateful operator tests.

The invariant for windows is again one-code-path: the streaming windowed
aggregate must equal the same expressions run in batch over the same
files. The stateful operator is checked against a hand-computed profile
and across a two-batch incremental run.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from aws_weather_data_pipeline_spark.streaming.windows import (
    EVENT_STREAM_SCHEMA,
    read_stream_events,
    running_user_stats,
    windowed_event_counts,
)


def _event(i, minute, user=1, etype="click", value=1.5):
    return {
        "event_id": i,
        "ts": f"2024-01-01T00:{minute:02d}:00.000Z",
        "user_id": user,
        "event_type": etype,
        "value": value,
    }


def _write_jsonl(path, events):
    path.write_text("\n".join(json.dumps(e) for e in events))


def test_streaming_windowed_counts_equal_batch(spark, tmp_path):
    landing = tmp_path / "events"
    landing.mkdir()
    evs = [
        _event(0, 1), _event(1, 4), _event(2, 11),
        _event(3, 12, etype="view"), _event(4, 25), _event(5, 59),
    ]
    _write_jsonl(landing / "a.json", evs[:4])
    _write_jsonl(landing / "b.json", evs[4:])

    stream = windowed_event_counts(read_stream_events(spark, str(landing)))
    q = (
        stream.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in spark.sql("SELECT * FROM wincounts").collect()
    }

    batch = windowed_event_counts(
        spark.read.schema(EVENT_STREAM_SCHEMA).json(str(landing))
    )
    want = {
        (str(r["window_start"]), r["event_type"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in batch.collect()
    }
    assert got == want
    assert len(got) == 5  # windows 00,10(x2 types),20,50


def test_running_user_stats_incremental(spark, tmp_path):
    landing = tmp_path / "events"
    landing.mkdir()
    _write_jsonl(
        landing / "a.json",
        [
            _event(0, 1, user=1, value=3.0, etype="click"),
            _event(1, 2, user=1, value=9.0, etype="view"),
            _event(2, 3, user=2, value=4.0, etype="click"),
        ],
    )
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        # The memory sink cannot recover from a checkpoint; foreachBatch
        # + parquet can, and is the production shape anyway. Each batch
        # appends its updated profiles tagged with the epoch; the
        # current state is the row with the highest epoch per user.
        stats = running_user_stats(
            read_stream_events(spark, str(landing))
        )
        q = (
            stats.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, epoch: df.withColumn(
                    "epoch", F.lit(epoch)
                ).write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        latest = {}
        for r in rows:
            if (
                r["user_id"] not in latest
                or r["epoch"] > latest[r["user_id"]]["epoch"]
            ):
                latest[r["user_id"]] = r
        return latest

    got = drain()
    assert got[1]["n_events"] == 2
    assert got[1]["max_value"] == 9.0
    assert got[1]["last_event_type"] == "view"
    assert got[2]["n_events"] == 1

    # Second batch: state must accumulate, not reset.
    _write_jsonl(
        landing / "b.json",
        [
            _event(3, 10, user=1, value=1.0, etype="purchase"),
            _event(4, 11, user=3, value=7.0, etype="click"),
        ],
    )
    got2 = drain()
    assert got2[1]["n_events"] == 3
    assert got2[1]["max_value"] == 9.0  # prior max survives
    assert got2[1]["last_event_type"] == "purchase"
    assert got2[3]["n_events"] == 1


def test_watermark_drops_late_data_in_append_mode(spark, tmp_path):
    # Late-data handling (absent from the reference entirely): in
    # append mode a window emits once the watermark passes its end;
    # an event arriving after that is dropped, not double-counted.
    landing = tmp_path / "events"
    landing.mkdir()
    # Batch 1: events in window [00:00, 00:10) plus one far-future
    # event that advances the watermark well past that window.
    _write_jsonl(
        landing / "a.json",
        [_event(0, 1), _event(1, 2), _event(2, 59)],
    )
    stream = windowed_event_counts(
        read_stream_events(spark, str(landing)),
        window="10 minutes",
        watermark="5 minutes",
    )
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, _e: df.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = {
        (str(r["window_start"]), r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    # The 00:00 window (2 events) closed; the 00:50 window is still open.
    assert ("2024-01-01 00:00:00", 2) in first

    # Batch 2: a LATE event for the already-closed 00:00 window.
    _write_jsonl(landing / "b.json", [_event(3, 3)])
    drain()
    after = [
        r
        for r in spark.read.parquet(out).collect()
        if str(r["window_start"]) == "2024-01-01 00:00:00"
    ]
    # Still exactly one emission of the closed window, still 2 events —
    # the late row was dropped by the watermark.
    assert len(after) == 1
    assert after[0]["n_events"] == 2


def test_streaming_session_windows_equal_batch(spark, tmp_path):
    from aws_weather_data_pipeline_spark.streaming.windows import (
        sessionized_user_activity,
    )

    landing = tmp_path / "events"
    landing.mkdir()
    # User 1: two sessions (gap > 10m between minute 2 and minute 30);
    # user 2: one session.
    _write_jsonl(
        landing / "a.json",
        [
            _event(0, 1, user=1),
            _event(1, 2, user=1),
            _event(2, 30, user=1),
            _event(3, 5, user=2),
        ],
    )
    stream = sessionized_user_activity(
        read_stream_events(spark, str(landing))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    batch = sessionized_user_activity(
        spark.read.schema(EVENT_STREAM_SCHEMA).json(str(landing))
    )
    want = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in batch.collect()
    }
    assert got == want
    assert got[(1, "2024-01-01 00:01:00")] == 2  # first session merged
    assert got[(1, "2024-01-01 00:30:00")] == 1  # second session split
    assert len(got) == 3


def test_streaming_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    from aws_weather_data_pipeline_spark.streaming.windows import (
        deduplicated_events,
    )

    landing = tmp_path / "events"
    landing.mkdir()
    # Batch 1: events 0,1 plus an in-batch duplicate of 0.
    _write_jsonl(
        landing / "a.json",
        [_event(0, 1), _event(1, 2), _event(0, 1)],
    )
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        dedup = deduplicated_events(
            read_stream_events(spark, str(landing))
        )
        q = (
            dedup.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, _e: df.write.mode("append").parquet(out)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            r["event_id"] for r in spark.read.parquet(out).collect()
        )

    assert drain() == [0, 1]

    # Batch 2: replays event 1 (cross-batch duplicate — the case plain
    # batch dropDuplicates inside foreachBatch CANNOT catch) + new 2.
    _write_jsonl(landing / "b.json", [_event(1, 2), _event(2, 3)])
    assert drain() == [0, 1, 2]


def test_stream_stream_join_equals_batch(spark, tmp_path):
    from aws_weather_data_pipeline_spark.streaming.windows import (
        attributed_purchases,
    )

    landing = tmp_path / "events"
    landing.mkdir()
    # user 1: click@1 → purchases @10 (in horizon) and @45 (outside);
    # user 2: purchase@5 with no prior click; click@50 → purchase@55.
    _write_jsonl(
        landing / "a.json",
        [
            _event(0, 1, user=1, etype="click"),
            _event(1, 10, user=1, etype="purchase", value=9.0),
            _event(2, 45, user=1, etype="purchase", value=3.0),
            _event(3, 5, user=2, etype="purchase", value=4.0),
        ],
    )
    _write_jsonl(
        landing / "b.json",
        [
            _event(4, 50, user=2, etype="click"),
            _event(5, 55, user=2, etype="purchase", value=7.0),
        ],
    )

    def split(df):
        return (
            df.filter(df.event_type == "click"),
            df.filter(df.event_type == "purchase"),
        )

    stream = attributed_purchases(
        *split(read_stream_events(spark, str(landing)))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["purchase_id"]): r["purchase_value"]
        for r in spark.sql("SELECT * FROM attrib").collect()
    }

    batch = attributed_purchases(
        *split(spark.read.schema(EVENT_STREAM_SCHEMA).json(str(landing)))
    )
    want = {
        (r["click_id"], r["purchase_id"]): r["purchase_value"]
        for r in batch.collect()
    }
    assert got == want
    # exactly the in-horizon attributions, across micro-batch boundary
    assert got == {(0, 1): 9.0, (4, 5): 7.0}


def test_session_window_merges_exact_gap_pair(spark):
    """Boundary pin (review r06, verified empirically): Spark's
    session_window MERGES two events exactly one gap apart — the
    split rule is gap strictly GREATER than the timeout. The oracles'
    gaps-and-islands twins must use strict > or they split pairs the
    engine merges, breaking the hash gate on any fixture containing
    an exact 10-minute gap."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:10:00"),  # gap == timeout: merges
            (1, "2024-01-01 00:20:01"),  # gap >  timeout: splits
        ],
        "user_id LONG, ts_s STRING",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"))
    sessions = sorted(
        (str(r["w"]["start"]), r["n"])
        for r in df.groupBy(
            F.session_window("ts", "10 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sessions == [
        ("2024-01-01 00:00:00", 2),
        ("2024-01-01 00:20:01", 1),
    ]
