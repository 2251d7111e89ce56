"""Multimodal column support: opaque binary payloads + typed metadata.

Design (BASELINE.md north star): image/audio/video content rides through
the engine as an opaque ``binary`` column with a typed metadata struct
alongside; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages so each Python worker sees columnar
batches, never Python-object rows.

The actual media codecs are NOT in this container, so the decode step is
STUBBED: ``decode_media`` raises ``NotImplementedError`` with a clear
marker, and ``fake_byte_features`` is the deterministic stand-in used by
tests and the catalog — the Spark-side plumbing (schema declaration,
batch iteration, Arrow transfer, partition-preserving shape) is real and
is exactly what a production decode UDF would plug into.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: Schema of the feature-extraction stage output — declared up front
#: (mapInPandas requires it; inference is impossible mid-stream).
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("last_byte", T.IntegerType(), True),
        T.StructField("byte_sum_mod", T.LongType(), True),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    In production the payload is the raw image/audio bytes read from the
    lake; here it is the utf-8 encoding of ``text_col`` so every stage
    downstream is testable. Metadata travels as a struct column, not
    loose columns, so a single ``payload_meta`` schema evolves cleanly.
    """
    return df.withColumn(
        "payload", F.encode(F.col(text_col), "utf-8")
    ).withColumn(
        "payload_meta",
        F.struct(
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit("text/plain").alias("content_type"),
        ),
    )


def decode_media(payload_bytes: bytes, content_type: str):  # pragma: no cover
    """STUB: decode an image/audio/video payload.

    The media libraries (PIL/opencv/ffmpeg/torchaudio) are not available
    in this environment. A deployment installs one and replaces this
    body; the surrounding mapInPandas plumbing is unchanged.
    """
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; see fake_byte_features for the deterministic "
        "test stand-in"
    )


def fake_byte_features(pdf_iter: Iterator) -> Iterator:
    """Deterministic per-payload features (the decode stand-in).

    Arrow hands pandas batches; numpy computes per-row byte statistics
    vectorized-ish (the loop is per payload, as a real decoder's would
    be — decoding is inherently per-item; batching amortizes transfer).
    """
    import pandas as pd

    for pdf in pdf_iter:
        out = {
            "doc_id": pdf["doc_id"],
            "n_bytes": [],
            "first_byte": [],
            "last_byte": [],
            "byte_sum_mod": [],
        }
        for payload in pdf["payload"]:
            b = bytes(payload)
            out["n_bytes"].append(len(b))
            out["first_byte"].append(b[0] if b else None)
            out["last_byte"].append(b[-1] if b else None)
            out["byte_sum_mod"].append(sum(b) % 997 if b else None)
        yield pd.DataFrame(out)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature-extraction stage: binary payloads → feature rows.

    ``mapInPandas`` so the exchange is Arrow record batches (no per-row
    Python overhead); the stage is narrow — it preserves partitioning,
    so no shuffle is introduced between scan and features.
    """
    return df.select("doc_id", "payload").mapInPandas(
        fake_byte_features, schema=FEATURE_SCHEMA
    )
