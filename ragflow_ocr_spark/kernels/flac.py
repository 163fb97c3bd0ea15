"""FLAC audio decode (and an encoder for lossless round trips).

Third real audio codec on the media route (after WAV/PCM, MP3, Ogg
Vorbis): free lossless audio, common for music/podcast archives in
real crawls. Covers the full mainline decode surface: STREAMINFO,
frame sync + header (blocksize/rate/channel-assignment codes, the
UTF-8-style coded number, CRC-8), subframe types CONSTANT / VERBATIM
/ FIXED (orders 0-4) / LPC (orders 1-32, signed quantized coefs +
shift), wasted bits, Rice-coded residual partitions (4- and 5-bit
params, escape-to-raw), stereo decorrelation (left/side, right/side,
mid/side), and the frame CRC-16.

Pinning strategy (no reference FLAC decoder in this sandbox; same
shape as kernels/mp3.py and kernels/vorbis.py):
- FLAC is LOSSLESS, so encode→decode must reproduce arbitrary input
  EXACTLY — and unlike the lossy codecs this lets the driver's DuckDB
  oracle check CONTENT (not silence) through the real codec: the
  multimodal oracle routes the same closed-form PCM the raw family
  uses through a FLAC container (ops/multimodal.py).
- Every integer algorithm (CRC-8/16, zigzag Rice, the coded number,
  fixed-predictor recurrences) is asserted against independent
  direct-from-spec models in tests/test_flac.py; the fixed predictor
  coefficients are the RFC 9639 closed forms (binomial rows).
- Mutation/truncation fuzzing: header and frame bytes are CRC-covered
  so flips fail loudly; metadata bytes outside any CRC are covered by
  structural checks.

Error contract: ValueError on malformed input, never any other
exception (same as every codec in kernels/).

Reference behavior: /root/reference/ocr/operators.py:41-46 accepts
any payload its binary decoders understand; SURVEY.md §2.3 S3.
"""

from __future__ import annotations

import functools
import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

MAX_DECODE_SAMPLES = 1 << 26  # same untrusted-payload ceiling as WAV/MP3


def _md5_samples(samples: np.ndarray, depth: int) -> bytes | None:
    """STREAMINFO MD5: the unencoded samples, channel-interleaved,
    little-endian signed, depth/8 bytes each. None for depths that
    are not whole bytes (the spec's sub-byte packing is not needed
    for anything this repo produces or checks)."""
    if depth % 8 or depth > 32:
        return None
    width = depth // 8
    flat = samples.reshape(-1)
    if width == 3:  # 24-bit: no native dtype
        u = (flat & 0xFFFFFF).astype(np.uint32)
        raw = np.stack(
            [u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF], axis=1
        ).astype(np.uint8).tobytes()
    else:
        raw = flat.astype(f"<i{width}").tobytes()
    return hashlib.md5(raw).digest()


def _codec_errors(fn):
    @functools.wraps(fn)
    def inner(*a, **kw):
        try:
            return fn(*a, **kw)
        except (struct.error, IndexError, KeyError, OverflowError,
                ZeroDivisionError) as e:
            raise ValueError(f"malformed flac: {e!r}") from e

    return inner


def crc8(data: bytes) -> int:
    """FLAC frame-header CRC-8: poly x^8+x^2+x+1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    """FLAC frame CRC-16: poly x^16+x^15+x^2+1 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _MsbBits:
    """MSB-first bit reader (FLAC convention, opposite of Vorbis)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes, start_byte: int = 0):
        self.data = data
        self.pos = start_byte * 8
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        pos = self.pos
        if pos + n > self.nbits:
            raise ValueError("flac bitstream truncated")
        val = 0
        data = self.data
        got = 0
        while got < n:
            byte = data[pos >> 3]
            off = pos & 7
            take = min(8 - off, n - got)
            chunk = (byte >> (8 - off - take)) & ((1 << take) - 1)
            val = (val << take) | chunk
            got += take
            pos += take
        self.pos = pos
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self, limit: int = 1 << 20) -> int:
        q = 0
        while not self.read(1):
            q += 1
            if q > limit:
                raise ValueError("flac unary run exceeds ceiling")
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _MsbWriter:
    """MSB-first bit writer (encoder side)."""

    def __init__(self):
        self.buf = bytearray()
        self.nbits = 0

    def write(self, val: int, n: int):
        for i in range(n - 1, -1, -1):
            if self.nbits % 8 == 0:
                self.buf.append(0)
            if (val >> i) & 1:
                self.buf[-1] |= 1 << (7 - self.nbits % 8)
            self.nbits += 1

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self.nbits % 8:
            self.write(0, 1)

    def bytes(self) -> bytes:
        return bytes(self.buf)


def zigzag_decode(u: int) -> int:
    """Rice residuals carry zigzag-folded signed values."""
    return (u >> 1) ^ -(u & 1)


def zigzag_encode(s: int) -> int:
    return (s << 1) ^ (s >> 63) if s >= 0 else ((-s) << 1) - 1


def read_coded_number(bits: _MsbBits) -> int:
    """The frame header's UTF-8-style variable-length number (up to
    36 bits over 7 bytes — a superset of real UTF-8)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n_follow = 0
    mask = 0x40
    while b0 & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("flac coded number malformed")
    val = b0 & (mask - 1)
    for _ in range(n_follow):
        b = bits.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("flac coded number continuation malformed")
        val = (val << 6) | (b & 0x3F)
    return val


def write_coded_number(w: _MsbWriter, val: int):
    if val < 0x80:
        w.write(val, 8)
        return
    # nf continuation bytes carry 6 bits each; the lead byte has
    # (nf+1) ones, a zero, then 6-nf payload bits → 5·nf+6 total
    for nf in range(1, 7):
        if val < (1 << (5 * nf + 6)):
            break
    else:
        raise ValueError("coded number exceeds 36 bits")
    lead = ((0xFF << (7 - nf)) & 0xFF) | (val >> (6 * nf))
    w.write(lead, 8)
    for k in range(nf - 1, -1, -1):
        w.write(0x80 | ((val >> (6 * k)) & 0x3F), 8)


# RFC 9639 fixed predictors: residual[i] = x[i] - sum(c_j * x[i-j])
FIXED_COEFS = (
    (),
    (1,),
    (2, -1),
    (3, -3, 1),
    (4, -6, 4, -1),
)

_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}

_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_DEPTH_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_residual(bits: _MsbBits, blocksize: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"reserved flac residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    n_part = 1 << porder
    if blocksize % n_part:
        raise ValueError("flac partition order does not divide blocksize")
    per = blocksize >> porder
    if per < order or (per == order and n_part > 1):
        raise ValueError("flac predictor order exceeds first partition")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(n_part):
        n = per - order if p == 0 else per
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            for i in range(n):
                out[idx + i] = bits.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                q = bits.read_unary()
                u = (q << param) | bits.read(param)
                out[idx + i] = zigzag_decode(u)
        idx += n
    return out


def _decode_subframe(bits: _MsbBits, blocksize: int, depth: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("flac subframe padding bit set")
    t = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.read_unary()
    depth -= wasted
    if depth <= 0:
        raise ValueError("flac wasted bits exceed sample depth")
    if t == 0:  # CONSTANT
        out = np.full(blocksize, bits.read_signed(depth), dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array(
            [bits.read_signed(depth) for _ in range(blocksize)], dtype=np.int64
        )
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        if order > blocksize:
            raise ValueError("flac fixed order exceeds blocksize")
        warm = np.array(
            [bits.read_signed(depth) for _ in range(order)], dtype=np.int64
        )
        res = _read_residual(bits, blocksize, order)
        # order-k fixed prediction is the k-th difference, so
        # reconstruction is k nested cumulative sums seeded by the
        # warmup's difference pyramid (vectorized; equivalence to the
        # spec's per-sample recurrence is pinned in tests)
        arr = res
        for lvl in range(order, 0, -1):
            seed = np.diff(warm, lvl - 1)[-1] if order else 0
            arr = np.cumsum(np.concatenate([[seed], arr]))[1:]
        out = np.concatenate([warm, arr])
    elif t >= 32:  # LPC order 1-32
        order = (t & 31) + 1
        if order > blocksize:
            raise ValueError("flac lpc order exceeds blocksize")
        warm = [bits.read_signed(depth) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("flac lpc precision code invalid")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("flac negative lpc shift")
        coefs = [bits.read_signed(precision) for _ in range(order)]
        res = _read_residual(bits, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coefs[j] * int(out[i - 1 - j])
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved flac subframe type {t}")
    if wasted:
        out <<= wasted
    return out


@_codec_errors
def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (int samples shape (n,) mono or (n, ch), rate).

    16-bit depth (the mainline) is what the media route synthesises;
    any depth in the format's table decodes. ValueError on malformed
    input."""
    if data[:4] != FLAC_MAGIC:
        raise ValueError("flac magic missing")
    pos = 4
    streaminfo = None
    last = False
    while not last:
        if pos + 4 > len(data):
            raise ValueError("flac metadata truncated")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + size]
        if len(body) < size:
            raise ValueError("flac metadata block truncated")
        if btype == 0:
            if size != 34:
                raise ValueError("flac STREAMINFO size wrong")
            streaminfo = body
        elif btype == 127:
            raise ValueError("flac invalid metadata block type")
        pos += 4 + size
    if streaminfo is None:
        raise ValueError("flac STREAMINFO missing")
    si = _MsbBits(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)  # min framesize
    si.read(24)  # max framesize
    rate = si.read(20)
    channels = si.read(3) + 1
    depth = si.read(5) + 1
    total = si.read(36)
    md5 = streaminfo[18:34]
    if rate == 0:
        raise ValueError("flac sample rate zero")
    if total > MAX_DECODE_SAMPLES:
        raise ValueError("flac sample count exceeds ceiling")
    bits = _MsbBits(data, pos)
    chunks: list[np.ndarray] = []
    got = 0
    # total == 0 means "unknown" (RFC 9639 §8.2: streaming-origin
    # files), not "no samples": decode frames to end of stream then.
    unknown_total = total == 0
    while bits.pos < bits.nbits and (unknown_total or got < total):
        frame = _decode_frame(bits, data, channels, depth, rate)
        got += frame.shape[0]
        if got > MAX_DECODE_SAMPLES:
            raise ValueError("flac sample count exceeds ceiling")
        chunks.append(frame)
    if got < total:
        raise ValueError("flac stream ends before STREAMINFO total")
    out = (
        np.concatenate(chunks, axis=0)
        if chunks
        else np.zeros((0, channels), dtype=np.int64)
    )
    if not unknown_total:
        out = out[: int(total)]
    if md5 != b"\x00" * 16:
        # the format's own end-to-end integrity check: MD5 of the
        # unencoded samples. Unset (all-zero) is legal and skipped.
        got = _md5_samples(out, depth)
        if got is not None and got != md5:
            raise ValueError("flac decoded-audio md5 mismatch")
    return (out[:, 0] if channels == 1 else out), rate


def _decode_frame(bits: _MsbBits, data: bytes, channels: int,
                  depth: int, rate: int) -> np.ndarray:
    hdr_start = bits.byte_pos()
    if bits.read(14) != 0x3FFE:
        raise ValueError("flac frame sync lost")
    if bits.read(1):
        raise ValueError("flac reserved frame bit set")
    bits.read(1)  # blocking strategy
    bs_code = bits.read(4)
    rate_code = bits.read(4)
    ch_code = bits.read(4)
    depth_code = bits.read(3)
    if bits.read(1):
        raise ValueError("flac reserved frame bit set")
    read_coded_number(bits)
    if bs_code == 0:
        raise ValueError("flac reserved blocksize code")
    elif bs_code == 6:
        blocksize = bits.read(8) + 1
    elif bs_code == 7:
        blocksize = bits.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_CODES[bs_code]
    if rate_code == 12:
        bits.read(8)
    elif rate_code in (13, 14):
        bits.read(16)
    elif rate_code == 15:
        raise ValueError("flac invalid rate code")
    # frame-header CRC-8 covers everything since the sync word
    hdr_end = bits.byte_pos()
    if bits.pos & 7:
        raise ValueError("flac frame header misaligned")
    if crc8(data[hdr_start:hdr_end]) != bits.read(8):
        raise ValueError("flac frame header crc mismatch")
    if depth_code:
        fdepth = _DEPTH_CODES.get(depth_code)
        if fdepth is None:
            raise ValueError("flac reserved depth code")
    else:
        fdepth = depth
    if ch_code < 8:
        n_ch = ch_code + 1
        if n_ch != channels:
            raise ValueError("flac frame channel count mismatch")
        subs = [_decode_subframe(bits, blocksize, fdepth)
                for _ in range(n_ch)]
        frame = np.stack(subs, axis=1)
    elif ch_code in (8, 9, 10):
        if channels != 2:
            raise ValueError("flac stereo decorrelation in non-stereo stream")
        # the difference channel carries one extra bit
        if ch_code == 8:  # left/side
            left = _decode_subframe(bits, blocksize, fdepth)
            side = _decode_subframe(bits, blocksize, fdepth + 1)
            frame = np.stack([left, left - side], axis=1)
        elif ch_code == 9:  # right/side
            side = _decode_subframe(bits, blocksize, fdepth + 1)
            right = _decode_subframe(bits, blocksize, fdepth)
            frame = np.stack([right + side, right], axis=1)
        else:  # mid/side
            mid = _decode_subframe(bits, blocksize, fdepth)
            side = _decode_subframe(bits, blocksize, fdepth + 1)
            m2 = (mid << 1) | (side & 1)
            frame = np.stack([(m2 + side) >> 1, (m2 - side) >> 1], axis=1)
    else:
        raise ValueError(f"reserved flac channel assignment {ch_code}")
    bits.align()
    foot_end = bits.byte_pos()
    if crc16(data[hdr_start:foot_end]) != bits.read(16):
        raise ValueError("flac frame crc mismatch")
    return frame


# ------------------------------------------------------------- encoder

def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    blocksize: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """Lossless FLAC encode of int16-range samples, shape (n,) mono or
    (n, 2) stereo. Subframe choice per channel: CONSTANT when flat,
    else the fixed order 0-2 with the smallest residual magnitude,
    Rice-coded (one partition, param fit to the mean residual).
    stereo_mode: independent | left_side | right_side | mid_side."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if channels not in (1, 2):
        raise ValueError("encoder supports 1 or 2 channels")
    if n and (x.min() < -32768 or x.max() > 32767):
        raise ValueError("encoder takes 16-bit-range samples")
    out = bytearray(FLAC_MAGIC)
    si = _MsbWriter()
    si.write(min(blocksize, max(n, 16)), 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(16 - 1, 5)
    si.write(n, 36)
    body = si.bytes() + _md5_samples(x, 16)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    frame_no = 0
    for start in range(0, n, blocksize):
        blk = x[start : start + blocksize]
        out += _encode_frame(blk, frame_no, channels, stereo_mode)
        frame_no += 1
    return bytes(out)


def _best_fixed_order(chan: np.ndarray) -> int:
    best, best_cost = 0, None
    for order in range(3):
        if order >= len(chan):
            break
        res = chan.copy()
        for _ in range(order):
            res = np.diff(res)
        cost = int(np.abs(res).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _write_subframe(w: _MsbWriter, chan: np.ndarray, depth: int):
    if len(chan) and np.all(chan == chan[0]):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write(int(chan[0]) & ((1 << depth) - 1), depth)
        return
    order = _best_fixed_order(chan)
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)
    mask = (1 << depth) - 1
    for i in range(order):
        w.write(int(chan[i]) & mask, depth)
    res = chan.copy()
    for _ in range(order):
        res = np.diff(res)
    # one Rice partition, param from the mean folded residual
    w.write(0, 2)   # 4-bit params
    w.write(0, 4)   # partition order 0
    mean = int(np.abs(res).mean() + 1) if len(res) else 1
    param = min(14, max(0, mean.bit_length()))
    w.write(param, 4)
    for v in res:
        u = zigzag_encode(int(v))
        w.write_unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _encode_frame(blk: np.ndarray, frame_no: int, channels: int,
                  stereo_mode: str) -> bytes:
    w = _MsbWriter()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)   # fixed blocksize strategy
    w.write(7, 4)   # blocksize as 16-bit field
    w.write(0, 4)   # rate from STREAMINFO
    ch_code = {"independent": channels - 1, "left_side": 8,
               "right_side": 9, "mid_side": 10}[stereo_mode]
    if ch_code >= 8 and channels != 2:
        raise ValueError("stereo mode on mono input")
    w.write(ch_code, 4)
    w.write(4, 3)   # 16-bit samples
    w.write(0, 1)
    write_coded_number(w, frame_no)
    w.write(len(blk) - 1, 16)
    hdr = w.bytes()
    w.write(crc8(hdr), 8)
    if ch_code < 8:
        for c in range(channels):
            _write_subframe(w, blk[:, c], 16)
    else:
        l, r = blk[:, 0], blk[:, 1]
        if ch_code == 8:
            _write_subframe(w, l, 16)
            _write_subframe(w, l - r, 17)
        elif ch_code == 9:
            _write_subframe(w, l - r, 17)
            _write_subframe(w, r, 16)
        else:
            _write_subframe(w, (l + r) >> 1, 16)
            _write_subframe(w, l - r, 17)
    w.align()
    body = w.bytes()
    w.write(crc16(body), 16)
    return w.bytes()
