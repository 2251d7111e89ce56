"""Multimodal plumbing tests: binary payloads, metadata, mapInPandas."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from aws_weather_data_pipeline_spark.functions.multimodal import (
    decode_media,
    extract_features,
    with_binary_payload,
    FEATURE_SCHEMA,
)


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError, match="media decoding"):
        decode_media(b"\x89PNG", "image/png")


def test_payload_and_features_roundtrip(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="abc"), Row(doc_id=2, text="zz")]
    )
    payloads = with_binary_payload(df)
    meta = {r["doc_id"]: r["payload_meta"] for r in payloads.collect()}
    assert meta[1]["n_bytes"] == 3
    assert meta[1]["content_type"] == "text/plain"

    feats = extract_features(payloads)
    assert feats.schema == FEATURE_SCHEMA
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert rows[1]["n_bytes"] == 3
    assert rows[1]["first_byte"] == ord("a")
    assert rows[1]["last_byte"] == ord("c")
    assert rows[1]["byte_sum_mod"] == (ord("a") + ord("b") + ord("c")) % 997
    assert rows[2]["first_byte"] == ord("z")


def test_frame_sampling_expands_rows_with_stride(spark):
    import hashlib

    from aws_weather_data_pipeline_spark.functions.multimodal import (
        FRAME_SCHEMA,
        sample_frames,
    )

    # 300 bytes → frames of 64: ceil(300/64)=5 frames, stride 4 keeps
    # indices 0 and 4; the last frame is ragged (300-256=44 bytes).
    text = "x" * 300
    df = spark.createDataFrame([Row(doc_id=7, text=text)])
    frames = sample_frames(with_binary_payload(df))
    assert frames.schema == FRAME_SCHEMA
    rows = {r["frame_idx"]: r for r in frames.collect()}
    assert sorted(rows) == [0, 4]
    assert rows[0]["n_frame_bytes"] == 64
    assert rows[4]["n_frame_bytes"] == 44
    assert rows[0]["frame_md5"] == hashlib.md5(b"x" * 64).hexdigest()
    assert rows[4]["frame_md5"] == hashlib.md5(b"x" * 44).hexdigest()


def test_resize_downsamples_and_updates_metadata(spark):
    from aws_weather_data_pipeline_spark.functions.multimodal import (
        resize_payload,
    )

    long = "ab" * 300   # 600 bytes → step ceil(600/128)=5 → 120 bytes
    short = "tiny"      # under target → untouched
    df = spark.createDataFrame(
        [Row(doc_id=1, text=long), Row(doc_id=2, text=short)]
    )
    out = {
        r["doc_id"]: r
        for r in resize_payload(
            with_binary_payload(df), target_bytes=128
        ).collect()
    }
    assert out[1]["orig_bytes"] == 600
    assert len(out[1]["payload"]) == 120
    assert out[1]["payload_meta"]["n_bytes"] == 120
    assert out[1]["payload_meta"]["content_type"] == "application/x-thumb"
    # deterministic: every 5th byte of "abab..." is always 'a'
    assert bytes(out[1]["payload"]) == bytes(("ab" * 300).encode()[::5])
    assert bytes(out[2]["payload"]) == b"tiny"
