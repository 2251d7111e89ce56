"""S2 REST poll source tests (injected fetch — no network)."""

from __future__ import annotations

from aws_weather_data_pipeline_spark.schemas import FLAT_COLUMNS
from aws_weather_data_pipeline_spark.sources.rest import (
    poll_to_dataframe,
    poll_to_landing_dir,
)
from tests.weather_fixtures import make_reading


def _fake_fetch_factory():
    calls = {"n": 0}

    def fetch(url, timeout=10.0):
        i = calls["n"]
        calls["n"] += 1
        return {"readings": [make_reading(3 * i + j) for j in range(3)]}

    return fetch


def test_poll_to_dataframe(spark):
    df = poll_to_dataframe(
        spark, "http://unused", n_polls=2, fetch=_fake_fetch_factory()
    )
    assert df.columns == FLAT_COLUMNS
    assert df.count() == 6
    ids = {r["station_id"] for r in df.collect()}
    assert ids == {f"WS{i:03d}" for i in range(6)}


def test_poll_to_landing_dir_feeds_batch_reader(spark, tmp_path):
    from aws_weather_data_pipeline_spark.sources.readers import read_raw_json

    landing = str(tmp_path / "landing")
    paths = poll_to_landing_dir(
        "http://unused", landing, n_polls=3, fetch=_fake_fetch_factory()
    )
    assert len(paths) == 3
    df = read_raw_json(spark, landing)
    assert df.count() == 9


def test_poll_to_landing_dir_never_reuses_filenames(tmp_path):
    # The file-stream source tracks seen files by path; a reused name
    # would be silently skipped. Successive poller invocations must
    # continue the sequence.
    landing = str(tmp_path / "landing")
    first = poll_to_landing_dir(
        "http://unused", landing, n_polls=2, fetch=_fake_fetch_factory()
    )
    second = poll_to_landing_dir(
        "http://unused", landing, n_polls=2, fetch=_fake_fetch_factory()
    )
    assert len(set(first) & set(second)) == 0
    assert len(set(first) | set(second)) == 4
