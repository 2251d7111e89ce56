"""FLAC codec (functions/flac.py): bit-exact lossless roundtrips,
decoder-only bitstream features, CRC/MD5 strictness, decode_media
integration. Pure-Python tests — no Spark session."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from aws_weather_data_pipeline_spark.functions import flac as FL
from aws_weather_data_pipeline_spark.functions.flac import (
    decode_flac,
    encode_flac,
)
from aws_weather_data_pipeline_spark.functions.multimodal import decode_media


def _roundtrip(samples, rate=44100, channels=1, **kw):
    arr = np.asarray(samples, dtype=np.int64)
    out = decode_flac(encode_flac(arr, rate, channels, **kw))
    assert out["n_channels"] == channels
    assert out["sample_rate"] == rate
    assert np.array_equal(out["samples"], arr)
    return out


# ---------------------------------------------------------------------------
# Encoder-path roundtrips (every subframe/stereo mode the encoder emits)
# ---------------------------------------------------------------------------


def test_random_noise_roundtrips_mono_and_stereo():
    rng = np.random.default_rng(11)
    _roundtrip(rng.integers(-32768, 32768, 3001), channels=1)
    _roundtrip(rng.integers(-32768, 32768, 4096), 48000, 2, block_size=512)


def test_predictable_signals_compress_and_roundtrip():
    ramp = (np.arange(6000) % 501) * 11 - 2000
    b = encode_flac(ramp, 16000, 1)
    assert len(b) < ramp.size * 2 * 0.7, "fixed predictors must engage"
    assert np.array_equal(decode_flac(b)["samples"], ramp)


def test_constant_blocks_and_silence():
    _roundtrip(np.zeros(1000, dtype=np.int64), 8000, 1, block_size=192)
    _roundtrip(np.full(500, 123), 8000, 1)
    b = encode_flac(np.full(4096, -7), 22050, 1)
    assert len(b) < 200, "constant subframes must be tiny"


def test_wasted_bits_detected_and_restored():
    rng = np.random.default_rng(12)
    scaled = rng.integers(-2048, 2048, 900) << 4  # 4 wasted bits
    plain = rng.integers(-2048, 2048, 900)
    assert len(encode_flac(scaled, 8000, 1)) < len(
        encode_flac(plain << 4 | 1, 8000, 1)
    )
    _roundtrip(scaled, 8000, 1)


def test_stereo_decorrelation_modes_chosen_and_exact():
    rng = np.random.default_rng(13)
    n = 2048
    # near-identical channels: side coding must beat independent
    left = rng.integers(-8000, 8000, n)
    right = left + rng.integers(-2, 3, n)
    corr = np.empty(2 * n, dtype=np.int64)
    corr[0::2], corr[1::2] = left, right
    b_corr = encode_flac(corr, 44100, 2, block_size=1024)
    ind = np.empty(2 * n, dtype=np.int64)
    ind[0::2] = rng.integers(-8000, 8000, n)
    ind[1::2] = rng.integers(-8000, 8000, n)
    b_ind = encode_flac(ind, 44100, 2, block_size=1024)
    assert len(b_corr) < len(b_ind) * 0.75
    assert np.array_equal(decode_flac(b_corr)["samples"], corr)
    assert np.array_equal(decode_flac(b_ind)["samples"], ind)


def test_odd_tail_block_and_nonstandard_sizes():
    rng = np.random.default_rng(14)
    for n, bs in [(1025, 1024), (700, 192), (333, 100), (37, 37)]:
        _roundtrip(rng.integers(-100, 100, n), 32000, 1, block_size=bs)


def test_nonstandard_sample_rate_uses_followup_code():
    _roundtrip(np.arange(300), rate=12345)
    _roundtrip(np.arange(300), rate=44100)  # table code path


def test_empty_stream():
    out = decode_flac(encode_flac([], 48000, 2))
    assert out["samples"].size == 0 and out["n_channels"] == 2


def test_int16_extremes_and_input_validation():
    _roundtrip(np.array([-32768, 32767] * 200), 8000, 2)
    with pytest.raises(ValueError, match="int16"):
        encode_flac([40000], 8000, 1)
    with pytest.raises(ValueError, match="integers"):
        encode_flac(np.array([1.5]), 8000, 1)
    with pytest.raises(ValueError, match="divisible"):
        encode_flac([1, 2, 3], 8000, 2)
    with pytest.raises(ValueError, match="channels"):
        encode_flac([1], 8000, 3)


def test_encoder_lpc_beats_fixed_on_smooth_signals():
    """The quantized-LPC path (Levinson-Durbin, residual computed via
    the decoder's exact integer recurrence) must engage on smooth
    periodic signals — strictly smaller output than the fixed-only
    encoder — and stay bit-exact on both smooth and noise inputs."""
    n = 8000
    t = np.arange(n)
    smooth = np.round(
        3000 * np.sin(2 * np.pi * t / 97)
        + 1500 * np.sin(2 * np.pi * t / 31)
    ).astype(np.int64)
    b_lpc = encode_flac(smooth, 44100, 1, lpc_order=8)
    b_fix = encode_flac(smooth, 44100, 1, lpc_order=0)
    assert len(b_lpc) < len(b_fix), "LPC must win on smooth input"
    assert np.array_equal(decode_flac(b_lpc)["samples"], smooth)
    assert np.array_equal(decode_flac(b_fix)["samples"], smooth)
    rng = np.random.default_rng(21)
    noise = rng.integers(-32768, 32768, 2000)
    assert np.array_equal(
        decode_flac(encode_flac(noise, 8000, 1, lpc_order=8))["samples"],
        noise,
    )


def test_encoder_lpc_roundtrip_property():
    """LPC-enabled encode must stay lossless for arbitrary inputs —
    the quantization/shift/clamp path can never corrupt samples, only
    change the coded size."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        n=st.integers(0, 400),
        channels=st.integers(1, 2),
        seed=st.integers(0, 2**31),
        smooth=st.booleans(),
    )
    def check(n, channels, seed, smooth):
        rng = np.random.default_rng(seed)
        if smooth:
            base = np.cumsum(rng.integers(-50, 51, n * channels))
            s = np.clip(base, -32768, 32767).astype(np.int64)
        else:
            s = rng.integers(-32768, 32768, n * channels)
        out = decode_flac(
            encode_flac(s, 8000, channels, block_size=128, lpc_order=8)
        )
        assert np.array_equal(out["samples"], s)

    check()


def test_roundtrip_property_random_geometries():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(0, 700),
        channels=st.integers(1, 2),
        block=st.integers(16, 300),
        seed=st.integers(0, 2**31),
        shift=st.integers(0, 8),
    )
    def check(n, channels, block, seed, shift):
        rng = np.random.default_rng(seed)
        lim = 32768 >> shift
        s = rng.integers(-lim, lim, n * channels) << shift
        out = decode_flac(
            encode_flac(s, 8000, channels, block_size=block)
        )
        assert np.array_equal(out["samples"], s)

    check()


# ---------------------------------------------------------------------------
# Decoder-only features (hand-built conforming bitstreams)
# ---------------------------------------------------------------------------


def _stream(frames: bytes, rate, channels, bps, total) -> bytes:
    """Wrap raw frame bytes with fLaC marker + STREAMINFO (zero MD5 =
    skip the stream-level verify; the per-frame CRCs still apply)."""
    si = FL._BitWriter()
    si.write(16, 16)
    si.write(65535, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.getvalue() + b"\x00" * 16
    return (
        b"fLaC"
        + bytes([0x80])
        + struct.pack(">I", len(body))[1:]
        + body
        + frames
    )


def _frame(
    subframe_bits, blocksize, rate_code=0b0000, assign=0b0000,
    bps_code=0b100, frame_no=0, variable=False,
) -> bytes:
    hdr = FL._BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1)
    hdr.write(1 if variable else 0, 1)
    if blocksize <= 256:
        hdr.write(0b0110, 4)
        bs_follow = ("u8", blocksize - 1)
    else:
        hdr.write(0b0111, 4)
        bs_follow = ("u16", blocksize - 1)
    hdr.write(rate_code, 4)
    hdr.write(assign, 4)
    hdr.write(bps_code, 3)
    hdr.write(0, 1)
    for byte in FL._utf8_coded(frame_no):
        hdr.write(byte, 8)
    hdr.write(bs_follow[1], 8 if bs_follow[0] == "u8" else 16)
    hdr.align()
    hb = hdr.getvalue()
    body = FL._BitWriter()
    subframe_bits(body)
    body.align()
    f = hb + bytes([FL._crc8(hb)]) + body.getvalue()
    return f + struct.pack(">H", FL._crc16(f))


def test_decoder_lpc_subframe():
    """LPC order 2, precision 4, shift 1: x[i] = res + ((3*x[i-1]
    - 1*x[i-2]) >> 1) — decoder must reproduce the recurrence."""
    warm = [100, 103]
    res = [5, -3, 0, 7, -2, 1, 4, -6, 2, 0, 1, -1, 3, 2]
    n = len(warm) + len(res)

    def sub(w):
        w.write(0, 1)
        w.write(0b100001, 6)  # LPC order 2
        w.write(0, 1)  # no wasted bits
        for v in warm:
            w.write_signed(v, 16)
        w.write(3, 4)  # precision 4 (code = prec-1)
        w.write_signed(1, 5)  # shift 1
        w.write_signed(3, 4)  # coef[0]
        w.write_signed(-1, 4)  # coef[1]
        w.write(0b00, 2)  # rice, 4-bit params
        w.write(0, 4)  # partition order 0
        w.write(2, 4)  # rice param 2
        for v in res:
            zz = (v << 1) if v >= 0 else ((-v << 1) - 1)
            w.write_unary(zz >> 2)
            w.write(zz, 2)

    raw = _stream(_frame(sub, n), 8000, 1, 16, n)
    out = decode_flac(raw)
    x = list(warm)
    for rv in res:
        x.append(rv + ((3 * x[-1] - x[-2]) >> 1))
    assert out["samples"].tolist() == x


def test_decoder_partition_orders_and_escape():
    """Partition order 2 (4 partitions) with one escape partition
    (raw width) and one zero-width escape — all must reassemble."""
    n = 64
    vals = [((i * 7) % 23) - 11 for i in range(n)]

    def sub(w):
        w.write(0, 1)
        w.write(0b001000, 6)  # FIXED order 0 -> residual == samples
        w.write(0, 1)
        w.write(0b00, 2)
        w.write(2, 4)  # partition order 2 -> 4 partitions of 16
        for p in range(4):
            part = vals[p * 16 : (p + 1) * 16]
            if p == 1:  # escape: raw 8-bit
                w.write(0b1111, 4)
                w.write(8, 5)
                for v in part:
                    w.write_signed(v, 8)
            elif p == 2:  # escape width 0: all zeros
                w.write(0b1111, 4)
                w.write(0, 5)
            else:
                w.write(3, 4)
                for v in part:
                    zz = (v << 1) if v >= 0 else ((-v << 1) - 1)
                    w.write_unary(zz >> 3)
                    w.write(zz, 3)

    expect = list(vals)
    expect[32:48] = [0] * 16
    raw = _stream(_frame(sub, n), 8000, 1, 16, n)
    assert decode_flac(raw)["samples"].tolist() == expect


def test_decoder_rice2_method_and_8bit_samples():
    vals = [3, -2, 0, 1, -5, 7, 2, -1] * 4

    def sub(w):
        w.write(0, 1)
        w.write(0b000001, 6)  # VERBATIM
        w.write(0, 1)
        for v in vals[8:]:
            w.write_signed(v, 8)

    def sub_rice2(w):
        w.write(0, 1)
        w.write(0b001000, 6)  # FIXED 0
        w.write(0, 1)
        w.write(0b01, 2)  # rice2: 5-bit parameters
        w.write(0, 4)
        w.write(1, 5)
        for v in vals:
            zz = (v << 1) if v >= 0 else ((-v << 1) - 1)
            w.write_unary(zz >> 1)
            w.write(zz, 1)

    raw = _stream(
        _frame(sub_rice2, len(vals), bps_code=0b001),
        8000, 1, 8, len(vals),
    )
    assert decode_flac(raw)["samples"].tolist() == vals
    raw2 = _stream(
        _frame(sub, len(vals) - 8, bps_code=0b001),
        8000, 1, 8, len(vals) - 8,
    )
    assert decode_flac(raw2)["samples"].tolist() == vals[8:]


def test_decoder_variable_blocking_and_rate_followups():
    vals = [9] * 20

    def sub(w):
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)
        w.write_signed(9, 16)

    # variable blocking strategy + frame-level 16-bit Hz rate code
    # (built by hand: _frame doesn't carry rate follow-up bits)
    hdr = FL._BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1)
    hdr.write(1, 1)
    hdr.write(0b0110, 4)
    hdr.write(0b1101, 4)
    hdr.write(0b0000, 4)
    hdr.write(0b100, 3)
    hdr.write(0, 1)
    for byte in FL._utf8_coded(0):
        hdr.write(byte, 8)
    hdr.write(19, 8)
    hdr.write(12345, 16)
    hdr.align()
    hb = hdr.getvalue()
    body = FL._BitWriter()
    sub(body)
    body.align()
    f = hb + bytes([FL._crc8(hb)]) + body.getvalue()
    raw = _stream(
        f + struct.pack(">H", FL._crc16(f)), 12345, 1, 16, 20
    )
    assert decode_flac(raw)["samples"].tolist() == vals


def test_decoder_skips_non_streaminfo_metadata_blocks():
    s = np.arange(100, dtype=np.int64)
    b = bytearray(encode_flac(s, 8000, 1))
    # clear last-flag on STREAMINFO, splice PADDING + VORBIS_COMMENT
    assert b[4] & 0x80
    b[4] &= 0x7F
    pad = bytes([0x01]) + struct.pack(">I", 5)[1:] + b"\x00" * 5
    vc = bytes([0x84]) + struct.pack(">I", 3)[1:] + b"abc"
    spliced = bytes(b[: 4 + 4 + 34]) + pad + vc + bytes(b[4 + 4 + 34 :])
    assert np.array_equal(decode_flac(spliced)["samples"], s)


def test_utf8_coded_number_roundtrips():
    for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
              0x1FFFFF, 0x3FFFFFF, 2**31 - 1, 2**36 - 1):
        enc = FL._utf8_coded(n)
        assert FL._read_utf8_coded(FL._BitReader(enc)) == n, n


def test_many_frames_use_coded_frame_numbers():
    # > 0x80 frames forces multi-byte coded numbers in real headers
    s = np.arange(16 * 200, dtype=np.int64) % 50
    _roundtrip(s, 8000, 1, block_size=16)


# ---------------------------------------------------------------------------
# Strictness: CRCs, MD5, malformed input
# ---------------------------------------------------------------------------


def test_frame_crc16_mismatch_rejected():
    s = (np.arange(2000, dtype=np.int64) % 321) * 7
    good = bytearray(encode_flac(s, 8000, 1, block_size=1024))
    # flip a bit inside the FIRST frame's body (well before EOF so
    # the failure is the CRC check, not truncation)
    good[60] ^= 0x01
    with pytest.raises(ValueError, match="CRC|MD5|truncated|sync"):
        decode_flac(bytes(good))


def test_header_crc8_mismatch_rejected():
    s = np.arange(300, dtype=np.int64)
    b = bytearray(encode_flac(s, 8000, 1, block_size=300))
    # frame starts right after 4 + 4 + 34 metadata bytes; corrupt the
    # channel-assignment nibble (byte 3 of the header)
    fstart = 4 + 4 + 34
    b[fstart + 3] ^= 0x10
    with pytest.raises(ValueError, match="CRC-8|reserved|channel"):
        decode_flac(bytes(b))


def test_stream_md5_mismatch_rejected():
    s = np.arange(500, dtype=np.int64)
    b = bytearray(encode_flac(s, 8000, 1))
    md5_at = 4 + 4 + 18  # STREAMINFO md5 offset
    b[md5_at] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(b))


def test_truncated_stream_with_unknown_md5_rejected():
    """Review r11: a stream whose MD5 is zero (unknown — the shape
    live-capture encoders emit) truncated at a FRAME boundary passes
    every CRC; the decoder must still raise because it delivered
    fewer samples than STREAMINFO promises, never decode silently
    short."""
    s = np.arange(128, dtype=np.int64) % 41
    full = bytearray(encode_flac(s, 8000, 1, block_size=64))
    short = encode_flac(s[:64], 8000, 1, block_size=64)
    # splice: full metadata (promises 128 samples, MD5 zeroed) + the
    # short stream's single frame (byte-identical to full's frame 0)
    md5_at = 4 + 4 + 18
    full[md5_at : md5_at + 16] = b"\x00" * 16
    spliced = bytes(full[:42]) + short[42:]
    with pytest.raises(ValueError, match="promises"):
        decode_flac(spliced)
    # sanity: the same splice WITH all frames decodes fine
    ok = bytes(full[:42]) + bytes(full[42:])
    assert np.array_equal(decode_flac(ok)["samples"], s)


def test_malformed_streams_rejected():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"OggS" + b"\x00" * 40)
    with pytest.raises(ValueError, match="truncated"):
        decode_flac(b"fLaC" + bytes([0x80]) + b"\x00\x00\x22" + b"x" * 10)
    with pytest.raises(ValueError, match="STREAMINFO"):
        decode_flac(
            b"fLaC" + bytes([0x81]) + b"\x00\x00\x02" + b"ab"
        )
    good = encode_flac(np.arange(100), 8000, 1)
    with pytest.raises(ValueError):
        decode_flac(good[:-5])  # truncated final frame


def test_decode_media_integration_and_quarantine_contract():
    s = np.arange(400, dtype=np.int64) % 97
    b = encode_flac(s, 22050, 1)
    out = decode_media(b, "audio/flac")
    assert np.array_equal(out["samples"], s)
    # malformed payloads normalize to ValueError (the quarantine
    # contract every decoder shares)
    with pytest.raises(ValueError):
        decode_media(b[:30], "audio/flac")
    with pytest.raises(NotImplementedError, match="PERCEPTUAL|ffmpeg"):
        decode_media(b"\xff\xfb\x90\x00" + b"\x00" * 32, "audio/mpeg")

# ---------------------------------------------------------------------------
# Corruption fuzz: a corrupt payload must raise ValueError, never die
# ---------------------------------------------------------------------------


def test_corrupted_streams_fail_closed_with_valueerror():
    """Seeded corruption fuzz over a real encoded stream: byte flips,
    truncations, length-field tampering, garbage splices. The decode
    quarantine (decode_media) catches ValueError per row — any OTHER
    exception class (IndexError, struct.error, MemoryError from an
    attacker-controlled allocation, an unbounded loop) would escape
    it and kill the whole 100 TB scan stage on one bad file. The
    decoder is structurally bounded — allocations come from the
    16-bit blocksize field, unary reads consume stream bits — and
    this pins it empirically: every corruption either still decodes
    (CRC collision; none observed at this seed) or raises ValueError
    promptly."""
    import random

    rng = random.Random(0xF1AC)
    base = np.array(
        [((i * 37) % 4000 - 2000) for i in range(700)], dtype=np.int64
    )
    stream = bytearray(encode_flac(base, 44100, 1))
    n_clean = 0
    for trial in range(300):
        buf = bytearray(stream)
        kind = trial % 4
        if kind == 0:  # flip 1-8 random bytes anywhere
            for _ in range(rng.randint(1, 8)):
                i = rng.randrange(len(buf))
                buf[i] ^= rng.randint(1, 255)
        elif kind == 1:  # truncate at a random point
            buf = buf[: rng.randrange(len(buf))]
        elif kind == 2:  # tamper metadata/frame length-ish early bytes
            i = rng.randrange(min(64, len(buf)))
            buf[i] = rng.randrange(256)
        else:  # splice random garbage into the middle
            i = rng.randrange(len(buf))
            buf[i:i] = bytes(
                rng.randrange(256) for _ in range(rng.randint(1, 32))
            )
        try:
            out = decode_flac(bytes(buf))
        except ValueError:
            continue
        # a decode that survives must be SEMANTICALLY untouched: the
        # mutation hit a don't-care byte (informational STREAMINFO
        # frame-size bounds, padding, or a same-value write) — the
        # stream-MD5 check inside decode forbids any sample change
        # slipping through as success
        assert out["n_channels"] == 1
        assert out["sample_rate"] == 44100
        assert np.array_equal(out["samples"], base)
        n_clean += 1
    # sanity: the fuzz actually exercised the error paths
    assert n_clean < 30, f"only {300 - n_clean} corruptions detected"
