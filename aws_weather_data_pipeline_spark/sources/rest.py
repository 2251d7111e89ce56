"""S2: REST API poll source (SURVEY §2.1).

The reference's producer polls a Flask endpoint every 2 s and forwards
each envelope to Kinesis (scripts/send_to_kinesis.py:48-113, poll
interval at :34). This is inherently a DRIVER-SIDE source — a single
low-rate HTTP endpoint, not a partitioned stream — so the Spark-native
shape is: fetch N envelopes on the driver, parallelize ONCE into a
DataFrame with the declared schema, and hand off to the same
flatten/transform path as every other source. (SURVEY marks this
non-core: at scale the landing-dir / Kinesis stream IS the source; the
poller exists only to feed it.)

stdlib-only (urllib); no external HTTP client dependency.
"""

from __future__ import annotations

import json
import time
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from .readers import parse_and_flatten


def fetch_envelope(url: str, timeout: float = 10.0) -> dict:
    """One GET → one parsed ``{"readings": [...]}`` envelope."""
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


def poll_to_dataframe(
    spark: SparkSession,
    url: str,
    n_polls: int = 1,
    interval_seconds: float = 0.0,
    fetch=fetch_envelope,
) -> DataFrame:
    """Poll ``url`` ``n_polls`` times; return the flattened readings.

    The envelopes are collected driver-side (tiny by construction —
    the reference's endpoint emits 5 readings/poll) and parallelized
    once under the declared schema; everything downstream is the
    normal distributed path. ``fetch`` is injectable for tests.
    """
    envelopes = []
    for i in range(n_polls):
        if i and interval_seconds:
            time.sleep(interval_seconds)
        envelopes.append(fetch(url))
    # Route through from_json rather than createDataFrame's strict
    # type verifier: a benign numeric rendering drift from the
    # endpoint (5.0 for an int field) would CRASH strict
    # verification, where every other source in the package nulls
    # bad cells out (P9 semantics; review r06). Serializing the
    # already-parsed dicts back to JSON is O(bytes) on a tiny
    # driver-side batch.
    raw = spark.createDataFrame(
        [(json.dumps(env),) for env in envelopes], "payload STRING"
    )
    # ONE parse path (review r11): parse_and_flatten is the same
    # from_json -> select -> flatten chain the streaming source uses;
    # a hand-rolled copy here would drift from schema-handling fixes.
    return parse_and_flatten(raw, "payload")


def poll_to_landing_dir(
    url: str,
    landing_dir: str,
    n_polls: int = 1,
    interval_seconds: float = 0.0,
    fetch=fetch_envelope,
) -> list[str]:
    """The production shape: poller feeds the streaming landing dir.

    Each poll writes one pretty-printed envelope file (the raw-zone
    format, scripts/kinesis_to_s3.py:238-246); the streaming pipeline
    (streaming/pipeline.py) picks them up. Returns written paths.
    """
    import os
    import re
    import tempfile

    os.makedirs(landing_dir, exist_ok=True)
    # Continue numbering from whatever is already in the landing dir:
    # Spark's file-stream source tracks seen files by PATH and treats
    # files as immutable, so re-using a name across poller invocations
    # would silently drop every envelope after the first run. The
    # numeric filter is a strict REGEX (a stray batch_manifest.json
    # must not crash the poller), and names are claimed with an
    # atomic os.link so two concurrent pollers can never clobber each
    # other's files (review r06); content lands via a dot-prefixed
    # temp file the stream source ignores, so a reader never sees a
    # half-written envelope.
    pat = re.compile(r"^batch_(\d+)\.json$")
    seqs = [
        int(m.group(1))
        for f in os.listdir(landing_dir)
        if (m := pat.match(f))
    ]
    seq = max(seqs) + 1 if seqs else 0
    written = []
    for i in range(n_polls):
        if i and interval_seconds:
            time.sleep(interval_seconds)
        env = fetch(url)
        fd, tmp = tempfile.mkstemp(
            prefix=".batch_incoming_", suffix=".json", dir=landing_dir
        )
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(env, f, indent=2)
        while True:
            path = os.path.join(landing_dir, f"batch_{seq:06d}.json")
            try:
                os.link(tmp, path)  # atomic claim; fails if taken
                break
            except FileExistsError:
                seq += 1
        os.unlink(tmp)
        seq += 1
        written.append(path)
    return written
