"""End-to-end pipeline runner tests (X1-X4)."""

from __future__ import annotations

import datetime

import pytest

from aws_weather_data_pipeline_spark.runner import (
    MAX_STALENESS_SECONDS,
    PipelinePaths,
    check_prerequisites,
    report,
    run,
    validate,
)
from tests.weather_fixtures import make_reading, write_batch_file

#: Fixture readings are stamped 2024-01-15; this "now" is the same
#: evening, so the freshness check sees data a few hours old.
FIXTURE_NOW = datetime.datetime(
    2024, 1, 15, 20, 0, 0, tzinfo=datetime.timezone.utc
)


@pytest.fixture()
def paths(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    write_batch_file(
        raw / "batch_001.json", [make_reading(i) for i in range(20)]
    )
    write_batch_file(
        raw / "batch_002.json",
        [make_reading(i, hour=14) for i in range(20, 35)],
    )
    return PipelinePaths(
        raw_dir=str(raw),
        lake_dir=str(tmp_path / "lake"),
        serving_dir=str(tmp_path / "serving"),
        summary_dir=str(tmp_path / "summary"),
    )


def test_prerequisites_fail_on_missing_dir(spark, tmp_path):
    bad = PipelinePaths(
        raw_dir=str(tmp_path / "nope"),
        lake_dir="",
        serving_dir="",
        summary_dir="",
    )
    with pytest.raises(FileNotFoundError):
        check_prerequisites(spark, bad)


def test_prerequisites_fail_on_empty_dir(spark, tmp_path):
    empty = tmp_path / "raw"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="no raw JSON"):
        check_prerequisites(
            spark, PipelinePaths(str(empty), "", "", "")
        )


def test_full_pipeline_run(spark, paths):
    result = run(spark, paths, now=FIXTURE_NOW)
    assert result.ok
    assert result.stats["total_rows"] == 35
    assert result.stats["duplicate_keys"] == 0
    assert result.stats["avg_quality"] >= 90.0
    assert result.checks["fresh"]
    assert 0 < result.stats["staleness_seconds"] < MAX_STALENESS_SECONDS

    serving = spark.read.parquet(paths.serving_dir)
    assert "alert_level" in serving.columns
    summary = spark.read.parquet(paths.summary_dir)
    cities = {r["city"] for r in summary.select("city").collect()}
    assert cities == {"Mumbai", "Delhi", "Chennai", "Kolkata", "Bengaluru"}
    # Rerunning the whole pipeline is idempotent on EVERY sink:
    # serving via the anti-join, the lake via dynamic partition
    # overwrite (append would double it), summary via partition upsert.
    lake_before = spark.read.parquet(paths.lake_dir).count()
    summary_before = summary.count()  # count now; the rerun replaces files
    result2 = run(spark, paths, now=FIXTURE_NOW)
    assert result2.stats["total_rows"] == 35
    assert spark.read.parquet(paths.lake_dir).count() == lake_before
    assert spark.read.parquet(paths.summary_dir).count() == summary_before

    text = report(spark, paths)
    assert "DAILY WEATHER SUMMARY" in text
    assert "Mumbai" in text
    assert "dominant: Clear" in text


def test_cli_main_backfill_with_as_of(spark, paths, capsys):
    """The CLI must support historical backfills: without --as-of the
    freshness check anchors at wall clock and 2024 fixture data is
    'stale'; with --as-of it passes and prints the report.
    """
    from aws_weather_data_pipeline_spark.runner import main

    rc = main(
        [
            paths.raw_dir,
            paths.lake_dir,
            paths.serving_dir,
            paths.summary_dir,
            "--report",
            "--as-of",
            "2024-01-15T20:00:00+00:00",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "'fresh': True" in out
    assert "DAILY WEATHER SUMMARY" in out

    with pytest.raises(RuntimeError, match="fresh"):
        main(
            [
                paths.raw_dir,
                paths.lake_dir,
                paths.serving_dir,
                paths.summary_dir,
            ]
        )


def test_validate_freshness_stale_and_fresh(spark, paths):
    """X3 freshness (reference README.md:750-755, age < 1 day): the
    same serving table passes with a now inside the window and fails
    with a now a week later — and run() surfaces the stale case as a
    pipeline failure.
    """
    run(spark, paths, now=FIXTURE_NOW)

    fresh = validate(spark, paths, now=FIXTURE_NOW)
    assert fresh.checks["fresh"]

    week_later = FIXTURE_NOW + datetime.timedelta(days=7)
    stale = validate(spark, paths, now=week_later)
    assert not stale.checks["fresh"]
    assert stale.stats["staleness_seconds"] > MAX_STALENESS_SECONDS
    # every non-freshness check still passes — the failure is isolated
    others = {k: v for k, v in stale.checks.items() if k != "fresh"}
    assert all(others.values())

    with pytest.raises(RuntimeError, match="fresh"):
        run(spark, paths, now=week_later)


def test_validate_tolerates_producer_clock_skew(spark, paths):
    """Review r11: a station clock running a few minutes fast yields
    a slightly negative age; that must not fail the run — while
    wildly future-dated data still does."""
    from aws_weather_data_pipeline_spark.runner import (
        CLOCK_SKEW_TOLERANCE_SECONDS,
    )

    run(spark, paths, now=FIXTURE_NOW)
    skewed_now = FIXTURE_NOW - datetime.timedelta(
        seconds=CLOCK_SKEW_TOLERANCE_SECONDS // 2
    )
    # NOTE: FIXTURE_NOW is already past the data's max timestamp, so
    # step back to just before it to simulate the fast producer
    latest = validate(spark, paths, now=FIXTURE_NOW).stats[
        "latest_timestamp"
    ]
    just_before = latest - datetime.timedelta(seconds=60)
    res = validate(spark, paths, now=just_before)
    assert res.stats["staleness_seconds"] < 0
    assert res.checks["fresh"], "benign skew must not fail the run"
    far_before = latest - datetime.timedelta(hours=2)
    res2 = validate(spark, paths, now=far_before)
    assert not res2.checks["fresh"], "wild future-dating must fail"
