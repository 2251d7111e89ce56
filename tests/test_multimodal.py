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
