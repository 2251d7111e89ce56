"""Executable driver-window rotation invariant (VERDICT r05 #8).

The driver's correctness harness checks the FIRST 50 catalog entries
each round; with a 144-query catalog that is a 3-round revisit cycle
at zero growth. The prose policy in ``plans/catalog.py`` says no
query's driver evidence may go more than 3 rounds stale — this test
turns that into a failing check: it reads every ``CORRECTNESS_r*.json``
the driver has produced, computes each query's latest GREEN driver
round, and asserts that under the COMMITTED window (which will be
checked in the upcoming round) no query exceeds the age limit and no
query has never been checked at all.

Pure-file test — no Spark session, runs in milliseconds.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Maximum allowed age, in rounds, of a query's latest green driver
#: row at the time the next round's results land.
MAX_AGE_ROUNDS = 3


def _latest_green_rows() -> tuple[dict[str, int], int]:
    """(query -> latest round with a green driver row, next round)."""
    latest: dict[str, int] = {}
    rounds: list[int] = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            # Green = no error, matching rows, matching schema;
            # hash_match may be absent/None for rows-only
            # (non-SQL-expressible) checks, but an explicit False on
            # any compare field disqualifies the row as evidence.
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    assert rounds, "no CORRECTNESS_r*.json files found"
    return latest, max(rounds) + 1


def test_no_query_exceeds_rotation_age_under_committed_window():
    from aws_weather_data_pipeline_spark.plans.catalog import (
        DRIVER_WINDOW,
        build_catalog,
    )

    latest, next_round = _latest_green_rows()
    catalog = build_catalog()
    violations: dict[str, str] = {}
    for name in catalog.queries:
        if name in DRIVER_WINDOW:
            continue  # will be (re-)checked in the upcoming round
        if name not in latest:
            violations[name] = (
                "never driver-checked and absent from DRIVER_WINDOW "
                "(new queries must enter the window at creation time)"
            )
            continue
        age = next_round - latest[name]
        if age > MAX_AGE_ROUNDS:
            violations[name] = (
                f"latest green driver row is r{latest[name]:02d} — "
                f"{age} rounds old at r{next_round:02d} under the "
                "committed window"
            )
    assert not violations, (
        f"rotation policy violated for {len(violations)} queries; "
        "move the stalest into DRIVER_WINDOW (plans/catalog.py): "
        f"{violations}"
    )


def test_rotation_remains_sustainable_at_current_catalog_size():
    """With W window slots and N catalog queries, every query can be
    revisited within MAX_AGE_ROUNDS only if N <= W * MAX_AGE_ROUNDS.
    Fails the moment query growth makes the committed cadence
    impossible, before any individual query actually goes stale."""
    from aws_weather_data_pipeline_spark.plans.catalog import (
        DRIVER_WINDOW,
        build_catalog,
    )

    n = len(build_catalog().queries)
    cap = len(DRIVER_WINDOW) * MAX_AGE_ROUNDS
    assert n <= cap, (
        f"catalog has {n} queries but a {len(DRIVER_WINDOW)}-slot "
        f"window revisits at most {cap} within {MAX_AGE_ROUNDS} "
        "rounds — either stop adding queries or raise the window"
    )
