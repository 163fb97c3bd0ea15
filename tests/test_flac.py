"""FLAC decode/encode — kernels/flac.

Pinning strategy (module docstring of kernels/flac.py): FLAC is
lossless, so encode→decode must reproduce arbitrary input EXACTLY;
every integer algorithm (CRC-8/16, zigzag Rice, the UTF-8-style coded
number, fixed-predictor recurrences) is additionally asserted against
independent direct-from-spec models here, and decoder-only paths the
encoder never emits (LPC, multi-partition residuals, escape
partitions, verbatim, wasted bits) are driven by hand-built frames
with expectations computed from the spec recurrences in this file."""

from __future__ import annotations

import random

import numpy as np
import pytest

from ragflow_ocr_spark.kernels import flac as F


# ------------------------------------------------------------- CRCs


def _crc8_model(data: bytes) -> int:
    """Bit-at-a-time long division by x^8+x^2+x+1, MSB-first."""
    reg = 0
    for b in data:
        for k in range(7, -1, -1):
            bit = (b >> k) & 1
            top = (reg >> 7) & 1
            reg = ((reg << 1) | bit) & 0xFF
            if top:
                reg ^= 0x07
    # flush 8 zero bits
    for _ in range(8):
        top = (reg >> 7) & 1
        reg = (reg << 1) & 0xFF
        if top:
            reg ^= 0x07
    return reg


def _crc16_model(data: bytes) -> int:
    reg = 0
    for b in data:
        for k in range(7, -1, -1):
            bit = (b >> k) & 1
            top = (reg >> 15) & 1
            reg = ((reg << 1) | bit) & 0xFFFF
            if top:
                reg ^= 0x8005
    for _ in range(16):
        top = (reg >> 15) & 1
        reg = (reg << 1) & 0xFFFF
        if top:
            reg ^= 0x8005
    return reg


def test_crcs_match_long_division_models():
    rng = np.random.RandomState(2)
    for blob in (b"", b"\x00", b"fLaC", b"\xff" * 33, rng.bytes(257)):
        assert F.crc8(blob) == _crc8_model(blob)
        assert F.crc16(blob) == _crc16_model(blob)


# ----------------------------------------------------- primitives


def test_zigzag_round_trip_and_order():
    # 0, -1, 1, -2, 2, ... (the spec's folding order)
    assert [F.zigzag_decode(u) for u in range(7)] == [0, -1, 1, -2, 2, -3, 3]
    for s in list(range(-70, 70)) + [-(1 << 40), 1 << 40]:
        assert F.zigzag_decode(F.zigzag_encode(s)) == s


def test_coded_number_round_trip_and_boundaries():
    vals = [0, 1, 0x7F, 0x80, (1 << 11) - 1, 1 << 11, (1 << 16) - 1,
            (1 << 21) - 1, 1 << 21, (1 << 26) - 1, (1 << 31) - 1,
            (1 << 36) - 1]
    for v in vals:
        w = F._MsbWriter()
        F.write_coded_number(w, v)
        data = w.bytes()
        assert F.read_coded_number(F._MsbBits(data)) == v
        # ASCII range is exactly one byte; beyond needs continuation
        assert (len(data) == 1) == (v < 0x80)
    with pytest.raises(ValueError):
        w = F._MsbWriter()
        F.write_coded_number(w, 1 << 36)


def test_msb_bit_reader_against_manual_bits():
    data = bytes([0b10110100, 0b01100011])
    bits = F._MsbBits(data)
    assert bits.read(3) == 0b101
    assert bits.read(1) == 0b1
    assert bits.read(7) == 0b0100011
    assert bits.read_signed(5) == 3
    bits = F._MsbBits(bytes([0b11100000]))
    assert bits.read_signed(3) == -1


def test_fixed_predictor_vectorized_matches_spec_recurrence():
    rng = np.random.RandomState(9)
    for order in range(5):
        warm = rng.randint(-1000, 1000, order).astype(np.int64)
        res = rng.randint(-500, 500, 200).astype(np.int64)
        # literal spec recurrence
        coefs = F.FIXED_COEFS[order]
        ref = list(warm)
        for r in res:
            pred = sum(c * ref[-1 - j] for j, c in enumerate(coefs))
            ref.append(r + pred)
        # the decoder's cumsum pyramid, via a crafted single frame
        arr = res
        for lvl in range(order, 0, -1):
            seed = np.diff(warm, lvl - 1)[-1] if order else 0
            arr = np.cumsum(np.concatenate([[seed], arr]))[1:]
        got = np.concatenate([warm, arr])
        assert np.array_equal(got, np.array(ref, dtype=np.int64)), order


# ---------------------------------------------------- round trips


def test_lossless_round_trip_mono_all_shapes():
    rng = np.random.RandomState(11)
    walk = np.clip(np.cumsum(rng.randint(-60, 61, 5000)), -32768, 32767)
    shapes = [
        walk.astype(np.int64),
        np.zeros(100, dtype=np.int64),
        np.full(333, 32767, dtype=np.int64),
        np.array([32767, -32768] * 500, dtype=np.int64),
        rng.randint(-32768, 32768, 777).astype(np.int64),  # noise → order 0
        np.arange(-900, 900, dtype=np.int64),               # ramp → order 2
    ]
    for x in shapes:
        for bs in (4096, 576, 192):
            data = F.encode_flac(x, 22050, blocksize=bs)
            y, sr = F.decode_flac(data)
            assert sr == 22050
            assert np.array_equal(x, y)


def test_lossless_round_trip_stereo_all_decorrelations():
    rng = np.random.RandomState(13)
    l = np.clip(np.cumsum(rng.randint(-40, 41, 3000)), -32768, 32767)
    r = np.clip(l + rng.randint(-5, 6, 3000), -32768, 32767)
    st = np.stack([l, r], axis=1).astype(np.int64)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        y, sr = F.decode_flac(F.encode_flac(st, 44100, stereo_mode=mode))
        assert np.array_equal(st, y), mode


def test_compression_is_real_on_predictable_signals():
    # the codec must actually compress, not just wrap: a random walk's
    # fixed-predictor residuals are small
    rng = np.random.RandomState(17)
    x = np.clip(np.cumsum(rng.randint(-20, 21, 20000)), -32768, 32767)
    data = F.encode_flac(x.astype(np.int64))
    assert len(data) < 2 * len(x) * 0.7


# ------------------------------------- decoder-only paths (hand-built)


def _begin_frame(blocksize, ch_code, frame_no=0):
    w = F._MsbWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)    # 16-bit blocksize field
    w.write(0, 4)    # rate from STREAMINFO
    w.write(ch_code, 4)
    w.write(4, 3)    # 16-bit
    w.write(0, 1)
    F.write_coded_number(w, frame_no)
    w.write(blocksize - 1, 16)
    w.write(F.crc8(w.bytes()), 8)
    return w


def _finish_frame(w):
    w.align()
    w.write(F.crc16(w.bytes()), 16)
    return w.bytes()


def _wrap_stream(frames: bytes, n: int, channels: int = 1,
                 rate: int = 16000) -> bytes:
    si = F._MsbWriter()
    si.write(16, 16)
    si.write(65535, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16
    return (F.FLAC_MAGIC + bytes([0x80]) + len(body).to_bytes(3, "big")
            + body + frames)


def test_lpc_subframe_matches_spec_recurrence():
    rng = np.random.RandomState(19)
    order, precision, shift = 3, 12, 10
    coefs = [1228, -613, 102]  # stable: |gain| < 1 at shift 10
    warm = [100, -200, 300]
    res = rng.randint(-40, 41, 61).astype(np.int64)
    w = _begin_frame(64, 0)
    w.write(0, 1)
    w.write(32 + order - 1, 6)  # LPC order 3
    w.write(0, 1)
    for v in warm:
        w.write(v & 0xFFFF, 16)
    w.write(precision - 1, 4)
    w.write(shift, 5)
    for c in coefs:
        w.write(c & ((1 << precision) - 1), precision)
    w.write(0, 2)   # rice 4-bit
    w.write(0, 4)   # one partition
    w.write(6, 4)   # rice param
    for v in res:
        u = F.zigzag_encode(int(v))
        w.write_unary(u >> 6)
        w.write(u & 63, 6)
    data = _wrap_stream(_finish_frame(w), 64)
    got, _ = F.decode_flac(data)
    ref = list(warm)
    for r in res:
        pred = sum(coefs[j] * ref[-1 - j] for j in range(order)) >> shift
        ref.append(int(r) + pred)
    assert np.array_equal(got, np.array(ref, dtype=np.int64))


def test_verbatim_wasted_bits_multipartition_and_escape():
    rng = np.random.RandomState(23)
    vals = rng.randint(-120, 121, 32).astype(np.int64)
    # verbatim subframe with 2 wasted bits: coded values are val>>2 at
    # depth 16-2; multiples of 4 survive losslessly
    data14 = vals * 4
    w = _begin_frame(32, 0)
    w.write(0, 1)
    w.write(1, 6)    # VERBATIM
    w.write(1, 1)    # wasted-bits flag
    w.write(0, 1)    # unary: one zero...
    w.write(1, 1)    # ...then the stop bit ⇒ wasted = 1 + 1 = 2
    for v in data14:
        w.write(int(v >> 2) & 0x3FFF, 14)
    got, _ = F.decode_flac(_wrap_stream(_finish_frame(w), 32))
    assert np.array_equal(got, data14)

    # fixed order 1, FOUR partitions, second one escape-coded raw
    res = rng.randint(-30, 31, 31).astype(np.int64)
    w = _begin_frame(32, 0)
    w.write(0, 1)
    w.write(8 + 1, 6)   # FIXED order 1
    w.write(0, 1)
    w.write(77 & 0xFFFF, 16)  # warmup
    w.write(0, 2)   # rice 4-bit params
    w.write(2, 4)   # partition order 2 → 4 partitions of 8 (first: 7)
    chunks = [res[:7], res[7:15], res[15:23], res[23:31]]
    for p, chunk in enumerate(chunks):
        if p == 1:
            w.write(15, 4)  # escape
            w.write(9, 5)   # 9 raw bits
            for v in chunk:
                w.write(int(v) & 0x1FF, 9)
        else:
            w.write(3, 4)
            for v in chunk:
                u = F.zigzag_encode(int(v))
                w.write_unary(u >> 3)
                w.write(u & 7, 3)
    got, _ = F.decode_flac(_wrap_stream(_finish_frame(w), 32))
    ref = np.concatenate([[77], 77 + np.cumsum(res)])
    assert np.array_equal(got, ref)


# ------------------------------------------------------------ fuzzing


def test_mutations_never_silently_corrupt():
    rng = np.random.RandomState(29)
    x = np.clip(np.cumsum(rng.randint(-30, 31, 2000)), -32768, 32767)
    x = x.astype(np.int64)
    data = F.encode_flac(x, blocksize=576)
    r = random.Random(31)
    silent = 0
    for _ in range(500):
        m = bytearray(data)
        m[r.randrange(len(m))] ^= 1 << r.randrange(8)
        try:
            y, _ = F.decode_flac(bytes(m))
            if not np.array_equal(y, x):
                silent += 1
        except ValueError:
            pass
    # frame bytes are CRC-covered; only non-semantic STREAMINFO bytes
    # (min/max framesize, md5) can absorb a flip, identically
    assert silent == 0


def test_truncations_and_garbage_raise_not_crash():
    rng = np.random.RandomState(37)
    x = np.clip(np.cumsum(rng.randint(-30, 31, 700)), -32768, 32767)
    data = F.encode_flac(x.astype(np.int64), blocksize=192)
    for cut in range(len(data)):
        with pytest.raises(ValueError):
            F.decode_flac(data[:cut])
    for _ in range(60):
        blob = rng.bytes(int(rng.randint(1, 2000)))
        for payload in (blob, b"fLaC" + blob):
            try:
                F.decode_flac(payload)
            except ValueError:
                pass


def test_unknown_total_samples_decodes_to_stream_end():
    # STREAMINFO total_samples == 0 means "unknown" (RFC 9639 §8.2:
    # streaming-origin files), not "empty": frames must still decode.
    rng = np.random.RandomState(41)
    x = np.clip(np.cumsum(rng.randint(-30, 31, 1500)), -32768, 32767)
    data = bytearray(F.encode_flac(x.astype(np.int64), 22050,
                                   blocksize=576))
    # total_samples occupies STREAMINFO bits 108..144: low nibble of
    # body byte 13 plus bytes 14-17; body starts at file offset 8.
    data[21] &= 0xF0
    data[22:26] = b"\x00\x00\x00\x00"
    # the STREAMINFO md5 still matches: it was computed over x and the
    # samples are unchanged, so the integrity check stays exercised
    y, sr = F.decode_flac(bytes(data))
    assert sr == 22050
    assert np.array_equal(x, y)
