"""Pure-Python FLAC codec (RFC 9639 subset) — the compressed-audio
decode path.

FLAC is the right codec to close the repo's "compressed audio"
boundary because it is LOSSLESS and fully algorithmic: no
psychoacoustic model, no transcribed spec tables (the CRCs are
polynomial-generated, the fixed predictors are binomial
coefficients, rice coding is pure arithmetic), so the repo's
fixture-exactness discipline (PPM/PNG/WAV/GIF/JPEG/AVI) applies
verbatim — encode→decode round-trips BIT-EXACTLY for any input, and
an oracle can re-derive every decoded statistic from the
construction rule. A perceptual codec (MP3/AAC) cannot be pinned
this way without a golden reference decoder, which this container
does not ship; that boundary stays honestly documented in
``decode_media``.

Decoder coverage (the full mono/stereo 8..32-bit core):

- stream marker + metadata-block walk (STREAMINFO parsed, all other
  block types skipped structurally);
- frame headers: both blocking strategies, every block-size /
  sample-rate / sample-size code including the end-of-header
  follow-ups, UTF-8-style coded frame/sample numbers, CRC-8 verify;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC any order
  (precision + signed shift + quantized coefficients), wasted bits;
- residuals: 4-bit and 5-bit rice methods, any partition order,
  escape partitions (raw-width samples, including width 0);
- stereo decorrelation: left/side, right/side, mid/side (side
  channel carries the +1 bit depth);
- frame CRC-16 verify and STREAMINFO MD5 verify of the decoded PCM.

Encoder subset (the fixture side, a real conforming encoder):
16-bit samples, fixed blocking, CONSTANT / VERBATIM / FIXED 0-2 /
quantized-LPC subframes (Levinson-Durbin up to order 8, coefficients
quantized at precision 12 with the residual computed through the
decoder's exact integer recurrence) chosen per channel by coded
cost, independent or left/side / mid/side stereo chosen per frame by
coded cost, wasted bits detected, single-partition rice residuals
with per-partition parameter search, correct CRC-8/CRC-16/MD5.
Everything it emits is spec-conformant; everything the decoder
accepts beyond it (deep partitions, escape widths, 8/20/24/32-bit)
is covered by dedicated bitstream-construction tests.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["encode_flac", "decode_flac"]


# ---------------------------------------------------------------------------
# CRCs (polynomial-generated tables, not transcription)
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    mask, top = (1 << width) - 1, 1 << (width - 1)
    table = []
    for byte in range(256):
        reg = byte << (width - 8)
        for _ in range(8):
            reg = ((reg << 1) ^ poly) if reg & top else (reg << 1)
        table.append(reg & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)  # x^8 + x^2 + x + 1
_CRC16_TABLE = _crc_table(0x8005, 16)  # x^16 + x^15 + x^2 + 1


def _crc8(data: bytes) -> int:
    reg = 0
    for b in data:
        reg = _CRC8_TABLE[reg ^ b]
    return reg


def _crc16(data: bytes) -> int:
    reg = 0
    for b in data:
        reg = ((reg << 8) & 0xFFFF) ^ _CRC16_TABLE[(reg >> 8) ^ b]
    return reg


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self.buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # q zero bits then a terminating one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def nbits(self) -> int:
        return len(self.buf) * 8 + self._nbits

    def append_bits(self, other: "_BitWriter") -> None:
        """Splice another writer's (possibly unaligned) bitstream in —
        lets the encoder reuse a probed subframe instead of
        re-encoding the winner (review r11)."""
        for byte in other.buf:
            self.write(byte, 8)
        if other._nbits:
            self.write(other._acc, other._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0, "unaligned"
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.bitpos = 0  # bits consumed of data[bytepos]

    def read(self, nbits: int) -> int:
        out = 0
        need = nbits
        while need:
            if self.bytepos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bitpos
            take = min(avail, need)
            cur = self.data[self.bytepos]
            chunk = (cur >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.bitpos += take
            need -= take
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


# ---------------------------------------------------------------------------
# Shared constants
# ---------------------------------------------------------------------------

#: FIXED-predictor residual weights by order: binomial-coefficient
#: differences (order n residual = n-th discrete difference).
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

#: Frame-header sample-rate codes (value -> Hz) for the common rates;
#: anything else the encoder sends via the 16-bit Hz follow-up.
_RATE_CODES = {
    88200: 0b0001, 176400: 0b0010, 192000: 0b0011, 8000: 0b0100,
    16000: 0b0101, 22050: 0b0110, 24000: 0b0111, 32000: 0b1000,
    44100: 0b1001, 48000: 0b1010, 96000: 0b1011,
}
_RATE_BY_CODE = {v: k for k, v in _RATE_CODES.items()}

#: Frame-header sample-size codes (code -> bits).
_BPS_BY_CODE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20,
                0b110: 24, 0b111: 32}
_BPS_CODES = {v: k for k, v in _BPS_BY_CODE.items()}


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index)."""
    if n < 0x80:
        return bytes([n])
    out, nbytes = [], 1
    limit = 0x800
    while n >= limit and nbytes < 6:
        limit <<= 5
        nbytes += 1
    nbytes += 1  # continuation count -> total bytes
    lead = (0xFF << (8 - nbytes)) & 0xFF
    body = [0x80 | ((n >> (6 * i)) & 0x3F) for i in range(nbytes - 1)]
    return bytes([lead | (n >> (6 * (nbytes - 1)))] + body[::-1])


def _read_utf8_coded(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    probe = first
    while probe & 0x80:
        nbytes += 1
        probe = (probe << 1) & 0xFF
    if nbytes < 2 or nbytes > 7:
        raise ValueError(f"bad coded-number lead byte {first:#x}")
    n = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        cont = r.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError(f"bad coded-number continuation {cont:#x}")
        n = (n << 6) | (cont & 0x3F)
    return n


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v << 1, (-v << 1) - 1).astype(np.int64)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _rice_cost(zz: np.ndarray, k: int) -> int:
    return int(np.sum(zz >> k)) + zz.size * (k + 1)


def _best_rice_param(zz: np.ndarray) -> int:
    best_k, best_c = 0, _rice_cost(zz, 0)
    for k in range(1, 15):
        c = _rice_cost(zz, k)
        if c < best_c:
            best_k, best_c = k, c
        elif c > best_c * 2:
            break
    return best_k


def _write_rice_residual(w: _BitWriter, res: np.ndarray) -> None:
    """Residual block: 4-bit rice method, partition order 0."""
    w.write(0b00, 2)  # rice method, 4-bit parameters
    w.write(0, 4)  # partition order 0: one partition
    zz = _zigzag(res.astype(np.int64))
    k = _best_rice_param(zz)
    w.write(k, 4)
    for v in zz.tolist():
        w.write_unary(v >> k)
        w.write(v, k)


def _subframe_cost(order: int, res: np.ndarray, bps: int) -> int:
    zz = _zigzag(res.astype(np.int64))
    return order * bps + 6 + _rice_cost(zz, _best_rice_param(zz))


#: Quantized-LPC coefficient precision the encoder writes (the field
#: itself supports 1-15; 12 is the classic speed/size sweet spot).
_LPC_PRECISION = 12


def _lpc_candidate(
    sub: np.ndarray, max_order: int
) -> tuple[int, list[int], int, np.ndarray] | None:
    """Best quantized-LPC predictor for one channel, or None.

    Levinson-Durbin over the raw autocorrelation yields float LPC
    coefficients for every order 1..max_order; the LAST stable order
    is quantized (precision _LPC_PRECISION, shift chosen so the
    largest coefficient fills the signed field) and the residual is
    computed with the QUANTIZED integer coefficients — the decoder's
    exact recurrence — so the candidate's coded cost is real, not an
    estimate, and the round-trip is bit-exact by construction."""
    n = sub.size
    if n <= max_order or max_order < 1:
        return None
    f = sub.astype(np.float64)
    autoc = np.array(
        [np.dot(f[: n - lag], f[lag:]) for lag in range(max_order + 1)]
    )
    if autoc[0] <= 0:
        return None  # all-zero block: CONSTANT handles it
    # Levinson-Durbin recursion
    err = autoc[0]
    coefs = np.zeros(0)
    for m in range(1, max_order + 1):
        acc = autoc[m] - (
            np.dot(coefs, autoc[m - 1 : 0 : -1]) if m > 1 else 0.0
        )
        if err <= 0:
            break
        k = acc / err
        coefs = np.concatenate([coefs - k * coefs[::-1], [k]]) if (
            coefs.size
        ) else np.array([k])
        err *= 1.0 - k * k
    order = coefs.size
    if order == 0:
        return None
    cmax = float(np.max(np.abs(coefs)))
    if cmax == 0.0 or not np.isfinite(cmax):
        return None
    # shift: scale the largest coefficient into the signed
    # _LPC_PRECISION-bit field; the frame format caps it at 15
    shift = int(
        np.floor(np.log2(((1 << (_LPC_PRECISION - 1)) - 1) / cmax))
    )
    shift = max(0, min(15, shift))
    q = np.clip(
        np.round(coefs * (1 << shift)),
        -(1 << (_LPC_PRECISION - 1)),
        (1 << (_LPC_PRECISION - 1)) - 1,
    ).astype(np.int64)
    if not np.any(q):
        return None
    # residual with the QUANTIZED coefficients (the decoder's math):
    # pred[i] = (sum_j q[j] * x[i-1-j]) >> shift
    pred = np.zeros(n - order, dtype=np.int64)
    for j in range(order):
        pred += q[j] * sub[order - 1 - j : n - 1 - j]
    res = sub[order:] - (pred >> shift)
    return order, q.tolist(), shift, res


def _encode_subframe(
    w: _BitWriter, x: np.ndarray, bps: int, lpc_order: int = 8
) -> None:
    """One channel: CONSTANT / best FIXED 0-2 / best quantized LPC /
    VERBATIM, with wasted bits detected first."""
    wasted = 0
    if x.size and np.any(x):
        ors = int(np.bitwise_or.reduce(x.astype(np.int64)))
        while not ors & 1:
            wasted += 1
            ors >>= 1
    sub = (x.astype(np.int64) >> wasted) if wasted else x.astype(np.int64)
    sbits = bps - wasted

    def header(type_code: int) -> None:
        w.write(0, 1)  # mandatory zero pad
        w.write(type_code, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if x.size and np.all(sub == sub[0]):
        header(0b000000)
        w.write_signed(int(sub[0]), sbits)
        return
    # (cost, kind, order, res, lpc-extras)
    candidates: list[tuple[int, str, int, np.ndarray, tuple]] = []
    for order, coefs in list(_FIXED_COEFS.items())[: 3]:
        if sub.size <= order:
            continue
        pred = np.zeros(sub.size - order, dtype=np.int64)
        for j, c in enumerate(coefs):
            pred += c * sub[order - 1 - j : sub.size - 1 - j]
        res = sub[order:] - pred
        candidates.append(
            (_subframe_cost(order, res, sbits), "fixed", order, res, ())
        )
    lpc = _lpc_candidate(sub, lpc_order)
    if lpc is not None:
        order, q, shift, res = lpc
        cost = (
            _subframe_cost(order, res, sbits)
            + 4 + 5 + order * _LPC_PRECISION
        )
        candidates.append((cost, "lpc", order, res, (q, shift)))
    verbatim_cost = sub.size * sbits
    if candidates and min(c[0] for c in candidates) < verbatim_cost:
        _, kind, order, res, extra = min(candidates, key=lambda c: c[0])
        if kind == "fixed":
            header(0b001000 | order)
        else:
            header(0b100000 | (order - 1))
        for v in sub[:order].tolist():
            w.write_signed(v, sbits)
        if kind == "lpc":
            q, shift = extra
            w.write(_LPC_PRECISION - 1, 4)
            w.write_signed(shift, 5)
            for c in q:
                w.write_signed(c, _LPC_PRECISION)
        _write_rice_residual(w, res)
        return
    header(0b000001)  # VERBATIM
    for v in sub.tolist():
        w.write_signed(v, sbits)


def _encoded_subframe(
    x: np.ndarray, bps: int, lpc_order: int = 8
) -> _BitWriter:
    w = _BitWriter()
    _encode_subframe(w, x, bps, lpc_order)
    return w


def encode_flac(
    samples,
    sample_rate: int,
    n_channels: int,
    block_size: int = 1024,
    lpc_order: int = 8,
) -> bytes:
    """Encode interleaved 16-bit PCM as a conforming FLAC stream.

    Fixed blocking; per frame, stereo input picks the cheapest of
    independent / left-side / mid-side coding by actual coded size;
    per channel, the cheapest of CONSTANT / FIXED 0-2 / quantized
    LPC up to ``lpc_order`` (Levinson-Durbin; 0 disables LPC) /
    VERBATIM. Same input contract as ``encode_wav`` (the fixture
    twin).
    """
    arr = np.asarray(samples)
    if arr.size and not np.issubdtype(arr.dtype, np.integer):
        raise ValueError(f"samples must be integers, got {arr.dtype}")
    arr = arr.astype(np.int64)
    if n_channels not in (1, 2):
        raise ValueError(f"encoder supports 1-2 channels, got {n_channels}")
    if arr.size % n_channels:
        raise ValueError(
            f"{arr.size} samples not divisible by {n_channels} channels"
        )
    if arr.size and (arr.min() < -32768 or arr.max() > 32767):
        raise ValueError("sample out of int16 range")
    if not 16 <= block_size <= 65535:
        raise ValueError(f"block_size {block_size} out of range")
    bps = 16
    frames_total = arr.size // n_channels
    md5 = hashlib.md5(arr.astype("<i2").tobytes()).digest()

    # ---- STREAMINFO ----
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(n_channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(frames_total, 36)
    streaminfo = si.getvalue() + md5
    out = bytearray(b"fLaC")
    out.append(0x80 | 0)  # last-block flag | STREAMINFO
    out += struct.pack(">I", len(streaminfo))[1:]
    out += streaminfo

    planar = arr.reshape(frames_total, n_channels).T if arr.size else (
        np.zeros((n_channels, 0), dtype=np.int64)
    )
    frame_no = 0
    for start in range(0, frames_total, block_size):
        block = planar[:, start : start + block_size]
        n = block.shape[1]
        # ---- pick the channel assignment by coded cost ----
        # The four distinct channel encodings (L, R, side, mid) are
        # each computed ONCE and the winning plan's bitstreams are
        # spliced into the frame body — no probe-then-re-encode
        # (review r11).
        if n_channels == 2:
            left, right = block[0], block[1]
            mid = (left + right) >> 1
            side = left - right
            enc = {
                "L": _encoded_subframe(left, bps, lpc_order),
                "R": _encoded_subframe(right, bps, lpc_order),
                "S": _encoded_subframe(side, bps + 1, lpc_order),
                "M": _encoded_subframe(mid, bps, lpc_order),
            }
            plans = {
                0b0001: ("L", "R"),
                0b1000: ("L", "S"),  # left/side
                0b1010: ("M", "S"),  # mid/side
            }
            assign = min(
                plans,
                key=lambda a: sum(enc[k].nbits() for k in plans[a]),
            )
            channels = [enc[k] for k in plans[assign]]
        else:
            assign = 0b0000
            channels = [_encoded_subframe(block[0], bps, lpc_order)]

        # ---- frame header ----
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking
        if n == 192:
            bs_code, bs_follow = 0b0001, None
        elif n in (576, 1152, 2304, 4608):
            bs_code = 0b0010 + (n // 576).bit_length() - 1
            bs_follow = None
        elif n in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
            bs_code = 0b1000 + (n // 256).bit_length() - 1
            bs_follow = None
        elif n <= 256:
            bs_code, bs_follow = 0b0110, ("u8", n - 1)
        else:
            bs_code, bs_follow = 0b0111, ("u16", n - 1)
        hdr.write(bs_code, 4)
        sr_code = _RATE_CODES.get(sample_rate)
        sr_follow = None
        if sr_code is None:
            if sample_rate < 65536:
                sr_code, sr_follow = 0b1101, ("u16", sample_rate)
            else:
                raise ValueError(f"sample rate {sample_rate} not encodable")
        hdr.write(sr_code, 4)
        hdr.write(assign, 4)
        hdr.write(_BPS_CODES[bps], 3)
        hdr.write(0, 1)  # reserved
        for byte in _utf8_coded(frame_no):
            hdr.write(byte, 8)
        if bs_follow is not None:
            hdr.write(bs_follow[1], 8 if bs_follow[0] == "u8" else 16)
        if sr_follow is not None:
            hdr.write(sr_follow[1], 16)
        hdr.align()
        header_bytes = hdr.getvalue()

        body = _BitWriter()
        for sub in channels:
            body.append_bits(sub)
        body.align()

        frame = header_bytes + bytes([_crc8(header_bytes)]) + body.getvalue()
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _read_residual(
    r: _BitReader, blocksize: int, order: int
) -> np.ndarray:
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = r.read(4)
    if blocksize % (1 << porder):
        raise ValueError(
            f"partition order {porder} does not divide blocksize "
            f"{blocksize}"
        )
    out = np.empty(blocksize - order, dtype=np.int64)
    pos = 0
    psize = blocksize >> porder
    if psize <= order and porder > 0 or (porder == 0 and psize < order):
        raise ValueError(
            f"partition size {psize} cannot hold predictor order {order}"
        )
    for p in range(1 << porder):
        n = psize - order if p == 0 else psize
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for i in range(n):
                out[pos + i] = r.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                q = r.read_unary()
                v = (q << param) | r.read(param)
                out[pos + i] = (v >> 1) ^ -(v & 1)
        pos += n
    return out


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1) != 0:
        raise ValueError("subframe header padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    sbits = bps - wasted
    if sbits <= 0:
        raise ValueError(f"wasted bits {wasted} >= sample size {bps}")

    if ftype == 0b000000:  # CONSTANT
        x = np.full(blocksize, r.read_signed(sbits), dtype=np.int64)
    elif ftype == 0b000001:  # VERBATIM
        x = np.fromiter(
            (r.read_signed(sbits) for _ in range(blocksize)),
            dtype=np.int64, count=blocksize,
        )
    elif 0b001000 <= ftype <= 0b001100:  # FIXED 0-4
        order = ftype & 0b111
        if order > blocksize:
            raise ValueError(
                f"fixed order {order} exceeds blocksize {blocksize}"
            )
        warm = [r.read_signed(sbits) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        x = np.empty(blocksize, dtype=np.int64)
        x[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * x[i - 1 - j]
            x[i] = res[i - order] + pred
    elif ftype >= 0b100000:  # LPC, order 1-32
        order = (ftype & 0b011111) + 1
        if order > blocksize:
            raise ValueError(
                f"LPC order {order} exceeds blocksize {blocksize}"
            )
        warm = [r.read_signed(sbits) for _ in range(order)]
        prec = r.read(4)
        if prec == 0b1111:
            raise ValueError("invalid LPC precision code 1111")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError(f"negative LPC shift {shift}")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        x = np.empty(blocksize, dtype=np.int64)
        x[:order] = warm
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * x[i - 1 - j]
            x[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved subframe type {ftype:#08b}")
    if wasted:
        x <<= wasted
    return x


def decode_flac(b: bytes) -> dict:
    """Decode a FLAC stream to ``{n_channels, sample_rate, samples}``
    (interleaved int32 numpy array) — the same contract as
    ``_decode_wav``. Verifies every frame's CRC-8/CRC-16 and, when
    STREAMINFO carries a nonzero MD5, the whole-stream PCM MD5;
    any mismatch raises ValueError (a 100 TB scan must quarantine
    corrupt payloads, not emit silently wrong samples)."""
    if b[:4] != b"fLaC":
        raise ValueError(f"not a FLAC stream: {b[:4]!r}")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(b):
            raise ValueError("truncated metadata block header")
        last = bool(b[pos] & 0x80)
        btype = b[pos] & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + b[pos + 1 : pos + 4])
        body = b[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise ValueError("truncated metadata block body")
        if btype == 0:
            if length != 34:
                raise ValueError(f"STREAMINFO length {length} != 34")
            streaminfo = body
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    r = _BitReader(streaminfo)
    r.read(16)  # min block size
    r.read(16)  # max block size
    r.read(24), r.read(24)  # frame size bounds
    si_rate = r.read(20)
    si_channels = r.read(3) + 1
    si_bps = r.read(5) + 1
    si_total = r.read(36)
    si_md5 = streaminfo[18:34]

    channels_out: list[list[int]] = [[] for _ in range(si_channels)]
    n_decoded = 0
    while pos < len(b):
        frame_start = pos
        r = _BitReader(b, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"bad frame sync {sync:#x} at byte {pos}")
        if r.read(1) != 0:
            raise ValueError("frame header reserved bit set")
        r.read(1)  # blocking strategy (coded number disambiguates)
        bs_code = r.read(4)
        sr_code = r.read(4)
        assign = r.read(4)
        bps_code = r.read(3)
        if r.read(1) != 0:
            raise ValueError("frame header second reserved bit set")
        _read_utf8_coded(r)
        if bs_code == 0b0000:
            raise ValueError("reserved block size code 0000")
        elif bs_code == 0b0001:
            blocksize = 192
        elif bs_code <= 0b0101:
            blocksize = 576 << (bs_code - 0b0010)
        elif bs_code == 0b0110:
            blocksize = r.read(8) + 1
        elif bs_code == 0b0111:
            blocksize = r.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 0b1000)
        if sr_code == 0b0000:
            rate = si_rate
        elif sr_code in _RATE_BY_CODE:
            rate = _RATE_BY_CODE[sr_code]
        elif sr_code == 0b1100:
            rate = r.read(8) * 1000
        elif sr_code == 0b1101:
            rate = r.read(16)
        elif sr_code == 0b1110:
            rate = r.read(16) * 10
        else:
            raise ValueError("invalid sample rate code 1111")
        # RFC 9639: the frame rate must agree with STREAMINFO. Without
        # this, a corrupted STREAMINFO rate decodes "successfully"
        # with wrong metadata — the samples are stream-MD5-protected
        # but the rate is pure metadata, so nothing else catches it
        # (found by the r12 corruption fuzz; the frame header's own
        # CRC-8 covers the frame-side copy).
        if rate != si_rate:
            raise ValueError(
                f"frame sample rate {rate} != STREAMINFO {si_rate}"
            )
        if bps_code == 0b000:
            bps = si_bps
        elif bps_code in _BPS_BY_CODE:
            bps = _BPS_BY_CODE[bps_code]
        else:
            raise ValueError(f"reserved sample size code {bps_code:#05b}")
        r.align()  # header reads above are whole bytes past bit 32
        expect_crc8 = _crc8(b[frame_start : r.bytepos])
        if r.read(8) != expect_crc8:
            raise ValueError(f"frame header CRC-8 mismatch at {frame_start}")

        if assign <= 0b0111:
            n_ch = assign + 1
            depths = [bps] * n_ch
        elif assign in (0b1000, 0b1001, 0b1010):
            n_ch = 2
            side_idx = 0 if assign == 0b1001 else 1
            depths = [bps, bps]
            depths[side_idx] += 1
        else:
            raise ValueError(f"reserved channel assignment {assign:#06b}")
        if n_ch != si_channels:
            raise ValueError(
                f"frame channel count {n_ch} != STREAMINFO {si_channels}"
            )

        subs = [_read_subframe(r, blocksize, d) for d in depths]
        r.align()
        frame_body_end = r.bytepos
        got_crc16 = r.read(16)
        if got_crc16 != _crc16(b[frame_start:frame_body_end]):
            raise ValueError(f"frame CRC-16 mismatch at {frame_start}")
        pos = r.bytepos

        if assign == 0b1000:  # left/side: R = L - side
            left, side = subs
            subs = [left, left - side]
        elif assign == 0b1001:  # right/side: L = R + side
            side, right = subs
            subs = [right + side, right]
        elif assign == 0b1010:  # mid/side
            mid, side = subs
            m = (mid << 1) | (side & 1)
            subs = [(m + side) >> 1, (m - side) >> 1]
        for ch, x in enumerate(subs):
            channels_out[ch].append(x)
        n_decoded += blocksize
        if si_total and n_decoded >= si_total:
            break

    if si_total and n_decoded != si_total:
        # the final frame may legally be short, but the TOTAL must
        # match: more samples than STREAMINFO promises is a corrupt
        # stream, and FEWER is a truncated one — a zero (unknown) MD5
        # must not let truncation decode silently short (review r11)
        raise ValueError(
            f"decoded {n_decoded} samples but STREAMINFO promises "
            f"{si_total}"
        )
    # one concatenate per channel, not per-frame Python-int boxing
    # (review r11: this runs once per ROW inside mapInPandas)
    planar = np.array(
        [
            np.concatenate(ch) if ch else np.empty(0, np.int64)
            for ch in channels_out
        ],
        dtype=np.int64,
    )
    interleaved = (
        planar.T.reshape(-1) if planar.size else np.empty(0, np.int64)
    )
    if si_md5 != b"\x00" * 16:
        nbytes = (si_bps + 7) // 8
        dt = {1: "<i1", 2: "<i2", 4: "<i4"}.get(nbytes)
        if dt is None:  # 24-bit: pack 3 LE bytes per sample
            le = interleaved.astype("<i4").tobytes()
            raw = b"".join(
                le[i : i + 3] for i in range(0, len(le), 4)
            )
        else:
            raw = interleaved.astype(dt).tobytes()
        if hashlib.md5(raw).digest() != si_md5:
            raise ValueError("stream PCM MD5 mismatch")
    return {
        "n_channels": si_channels,
        "sample_rate": si_rate,
        "samples": interleaved.astype(np.int32),
    }
