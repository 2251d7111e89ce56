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

import pandas as pd
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


#: Frame-sampling stage output — one row per SAMPLED frame.
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), True),
        T.StructField("n_frame_bytes", T.IntegerType(), True),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)

FRAME_BYTES = 64
FRAME_STRIDE = 4


def sample_frames(
    df: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Frame-sampling stage: every ``stride``-th fixed-size frame.

    The video-pipeline shape: payload → frames → keep a deterministic
    subset (here every stride-th ``frame_bytes`` window stands in for
    ffmpeg keyframe extraction — the container has no codecs). Row
    EXPANSION inside ``mapInPandas``: one input row yields
    ⌈n_bytes/frame_bytes⌉/stride output rows, which Arrow batches
    back without a shuffle — the stage stays narrow, and downstream
    per-frame ops key on (doc_id, frame_idx).
    """
    import hashlib

    def gen(pdf_iter: Iterator) -> Iterator:
        for pdf in pdf_iter:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "n_frame_bytes": [],
                "frame_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for idx in range(0, -(-len(b) // frame_bytes), stride):
                    frame = b[idx * frame_bytes : (idx + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["n_frame_bytes"].append(len(frame))
                    out["frame_md5"].append(
                        hashlib.md5(frame).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(
        gen, schema=FRAME_SCHEMA
    )


def distinct_byte_count_col():
    """Vectorized scalar ``pandas_udf``: distinct byte values per payload.

    The third Python-boundary shape alongside ``mapInPandas`` (row
    expansion) and ``applyInPandasWithState`` (keyed state): a scalar
    column function that Spark calls with Arrow-batched Series — the
    drop-in slot for per-item model scoring (quality classifiers,
    perplexity filters) where the computation is a black box but the
    signature is column-in, column-out. Row-at-a-time ``F.udf`` would
    pay per-row (de)serialization; the pandas form amortizes it per
    batch.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _distinct_bytes(payload: pd.Series) -> pd.Series:
        return payload.map(
            lambda b: len(set(bytes(b))) if b is not None else None
        ).astype("Int32")

    return _distinct_bytes


def resize_payload(df: DataFrame, target_bytes: int = 128) -> DataFrame:
    """Resize stage: downsample each payload to ≤ ``target_bytes``.

    Deterministic stand-in for an image resize (no codecs in this
    container): keep every ⌈n/target⌉-th byte — a real implementation
    decodes, resizes, re-encodes inside the same ``mapInPandas`` body
    (see ``decode_media``). Output is the resized frame's contract
    columns only — (doc_id, payload, payload_meta, orig_bytes) — so
    stages that consume exactly the payload+metadata contract (the
    feature and frame stages) compose on top unchanged; other source
    columns must be re-joined on doc_id if needed.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("orig_bytes", T.IntegerType(), True),
        ]
    )

    def gen(pdf_iter: Iterator) -> Iterator:
        for pdf in pdf_iter:
            rows = {"doc_id": [], "payload": [], "orig_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(1, -(-len(b) // target_bytes))
                rows["doc_id"].append(doc_id)
                rows["payload"].append(b[::step])
                rows["orig_bytes"].append(len(b))
            yield pd.DataFrame(rows)

    resized = df.select("doc_id", "payload").mapInPandas(
        gen, schema=out_schema
    )
    return resized.withColumn(
        "payload_meta",
        F.struct(
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit("application/x-thumb").alias("content_type"),
        ),
    )
