"""Multimodal column support: opaque binary payloads + typed metadata.

Design (BASELINE.md north star): image/audio/video content rides through
the engine as an opaque ``binary`` column with a typed metadata struct
alongside; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages so each Python worker sees columnar
batches, never Python-object rows.

``decode_media`` is a REAL decoder for binary PPM (P6) — pure Python,
spec-compliant header parsing, exercised end-to-end by the
``multimodal_decode_ppm`` catalog query with an integer-exact oracle.
JPEG/PNG/audio/video codecs are not in this container; for those
content types ``decode_media`` raises ``NotImplementedError`` and a
deployment adds a branch (PIL/ffmpeg) without touching the surrounding
mapInPandas plumbing. ``fake_byte_features`` remains the
codec-independent byte-stat stand-in used by the feature-extract query.
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


def decode_media(payload_bytes: bytes, content_type: str) -> dict:
    """Decode an image payload to ``{width, height, maxval, pixels}``.

    Implemented pure-Python for binary PPM (P6) — a real decode of a
    real format with zero library dependencies, exercising the
    mapInPandas slot end-to-end. Every other content type still raises
    ``NotImplementedError``: those codecs (JPEG/PNG/audio/video) need
    libraries not present in this container; a deployment installs
    PIL/ffmpeg and adds branches here — the surrounding plumbing
    (``decode_ppm_features``) is format-agnostic and unchanged.
    """
    if content_type != "image/x-portable-pixmap":
        raise NotImplementedError(
            f"no decoder for {content_type!r} in this environment; "
            "binary PPM (image/x-portable-pixmap) is the built-in "
            "reference decoder"
        )
    return _decode_ppm(payload_bytes)


def _decode_ppm(b: bytes) -> dict:
    """Parse a binary PPM (P6): header tokens (with ``#`` comments and
    arbitrary whitespace, per the netpbm spec), then the raw RGB plane.
    """
    if b[:2] != b"P6":
        raise ValueError(f"not a P6 PPM: magic={b[:2]!r}")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = tokens
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported maxval {maxval} (1-byte samples only)")
    n = width * height * 3
    pixels = b[pos : pos + n]
    if len(pixels) != n:
        raise ValueError(f"raster truncated: {len(pixels)} of {n} bytes")
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "pixels": pixels,
    }


def with_ppm_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a synthetic binary-PPM payload derived from ``text_col``.

    Dimensions come from doc_id (width 1-8, height 1-5) and the raster
    is the document text truncated/right-padded to exactly w*h*3 bytes
    — all built with NATIVE column functions (concat/encode/rpad), so
    the payload construction itself is codegen-side and a SQL oracle
    can re-derive every decoded statistic integer-exactly. The corpus
    is ASCII, so char windows == byte windows on both engines.
    """
    w = F.lit(1) + F.pmod("doc_id", F.lit(8))
    h = F.lit(1) + F.pmod("doc_id", F.lit(5))
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "),
        h.cast("string"), F.lit("\n255\n"),
    )
    # rpad TRUNCATES past the target length, so the raster is exactly
    # w*h*3 bytes whether the text is long or short (max 8*5*3 = 120).
    raster = F.expr(
        f"rpad(substring({text_col}, 1, 120), "
        "(1 + pmod(doc_id, 8)) * (1 + pmod(doc_id, 5)) * 3, 'x')"
    )
    return df.withColumn(
        "payload",
        F.concat(F.encode(header, "utf-8"), F.encode(raster, "utf-8")),
    ).withColumn(
        "payload_meta",
        F.struct(
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit("image/x-portable-pixmap").alias("content_type"),
        ),
    )


#: Decode-stage output schema: integer-exact image statistics.
PPM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("maxval", T.IntegerType(), True),
        T.StructField("n_pixel_bytes", T.LongType(), True),
        T.StructField("pixel_byte_sum", T.LongType(), True),
        T.StructField("mean_pixel_value", T.DoubleType(), True),
    ]
)


def decode_ppm_features(df: DataFrame) -> DataFrame:
    """Decode stage: PPM payloads → image statistics via ``decode_media``.

    Same Arrow-batched ``mapInPandas`` shape as ``extract_features``,
    but the per-item body is the REAL decoder — the slot a JPEG/PNG
    decoder drops into. Narrow stage: partition-preserving, no shuffle;
    only (doc_id, payload, content_type) crosses the Arrow boundary.
    """

    def gen(pdf_iter: Iterator) -> Iterator:
        for pdf in pdf_iter:
            out = {k.name: [] for k in PPM_SCHEMA.fields}
            for doc_id, payload, ctype in zip(
                pdf["doc_id"], pdf["payload"], pdf["content_type"]
            ):
                img = decode_media(bytes(payload), ctype)
                n = len(img["pixels"])
                s = sum(img["pixels"])
                out["doc_id"].append(doc_id)
                out["width"].append(img["width"])
                out["height"].append(img["height"])
                out["maxval"].append(img["maxval"])
                out["n_pixel_bytes"].append(n)
                out["pixel_byte_sum"].append(s)
                # one exact int division — bit-identical on any engine
                out["mean_pixel_value"].append(s / n if n else None)
            yield pd.DataFrame(out)

    return df.select(
        "doc_id", "payload",
        F.col("payload_meta.content_type").alias("content_type"),
    ).mapInPandas(gen, schema=PPM_SCHEMA)


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
