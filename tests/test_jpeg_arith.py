"""Arithmetic-coded JPEG (SOF9) — kernels/jpeg_arith + imgcodecs.

Validation tiers:
1. QM_TABLE is pinned literal-for-literal against the system
   libjpeg's exported `jpeg_aritab` (T.81 Table D.3) when present.
2. The QM coder pair round-trips arbitrary skewed bit sequences
   bit-exactly, including the carry/0xFF-stacking paths.
3. Full images: arithmetic encode → our decode must equal the
   Huffman pipeline decode EXACTLY (same DCT path, different entropy
   layer only), and the system libjpeg (via gdk-pixbuf file loading —
   the incremental loader cannot suspend inside arithmetic scans)
   must decode our arithmetic bytes to the same pixels within the
   same ±1 ISLOW-IDCT calibration as the Huffman cross-checks.
"""

from __future__ import annotations

import ctypes
import os
import random
import tempfile

import numpy as np
import pytest

from ragflow_ocr_spark.kernels import imgcodecs as ic
from ragflow_ocr_spark.kernels import jpeg_arith as ja


def _libjpeg():
    for name in ("libjpeg.so.62", "libjpeg.so"):
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def _pixbuf_file_decode(data: bytes):
    """System decode via gdk_pixbuf_new_from_file → (h, w, nc) array
    or None if gdk-pixbuf is unavailable."""
    for name in ("libgdk_pixbuf-2.0.so.0", "libgdk_pixbuf-2.0.so"):
        try:
            gp = ctypes.CDLL(name)
            break
        except OSError:
            gp = None
    if gp is None:
        return None
    gp.gdk_pixbuf_new_from_file.restype = ctypes.c_void_p
    gp.gdk_pixbuf_new_from_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p)]
    gp.gdk_pixbuf_get_pixels.restype = ctypes.POINTER(ctypes.c_uint8)
    gp.gdk_pixbuf_get_pixels.argtypes = [ctypes.c_void_p]
    for f in ("gdk_pixbuf_get_width", "gdk_pixbuf_get_height",
              "gdk_pixbuf_get_rowstride", "gdk_pixbuf_get_n_channels"):
        getattr(gp, f).restype = ctypes.c_int
        getattr(gp, f).argtypes = [ctypes.c_void_p]
    fd, path = tempfile.mkstemp(suffix=".jpg")
    try:
        os.write(fd, data)
        os.close(fd)
        err = ctypes.c_void_p()
        pb = gp.gdk_pixbuf_new_from_file(
            path.encode(), ctypes.byref(err))
        if not pb:
            return "rejected"
        w = gp.gdk_pixbuf_get_width(pb)
        h = gp.gdk_pixbuf_get_height(pb)
        rs = gp.gdk_pixbuf_get_rowstride(pb)
        nc = gp.gdk_pixbuf_get_n_channels(pb)
        buf = ctypes.cast(
            gp.gdk_pixbuf_get_pixels(pb),
            ctypes.POINTER(ctypes.c_uint8 * (rs * h)),
        ).contents
        return (np.frombuffer(bytearray(buf), np.uint8)
                .reshape(h, rs)[:, : w * nc].reshape(h, w, nc).copy())
    finally:
        os.unlink(path)


# ------------------------------------------------------------- table


def test_qm_table_matches_system_libjpeg():
    lib = _libjpeg()
    if lib is None:
        pytest.skip("libjpeg not available")
    try:
        arr = (ctypes.c_int64 * 114).in_dll(lib, "jpeg_aritab")
    except ValueError:
        pytest.skip("jpeg_aritab not exported")
    for i in range(114):
        v = arr[i]
        qe = (v >> 16) & 0xFFFF
        nm = (v >> 8) & 0xFF
        sw = (v >> 7) & 1
        nl = v & 0x7F
        assert ja.QM_TABLE[i] == (qe, nl, nm, sw), i


def test_qm_table_structure():
    # Qe is a probability (< 0.5 in the 0x10000 scale except the
    # start/fixed states), transitions stay in range, switch states
    # are exactly the ones whose LPS transition re-targets themselves
    for i, (qe, nl, nm, sw) in enumerate(ja.QM_TABLE):
        assert 1 <= qe <= 0x5B12
        assert 0 <= nl <= 113 and 0 <= nm <= 113
    assert ja.QM_TABLE[113][1] == ja.QM_TABLE[113][2] == 113  # fixed bin


# ---------------------------------------------------------- QM coder


def test_qm_coder_round_trips_skewed_bit_sequences():
    rng = random.Random(7)
    for trial in range(8):
        n_ctx = rng.randint(1, 6)
        bits = []
        ctxs = []
        skews = [rng.random() for _ in range(n_ctx)]
        for _ in range(rng.randint(200, 30000)):
            c = rng.randrange(n_ctx)
            ctxs.append(c)
            bits.append(1 if rng.random() < skews[c] else 0)
        enc = ja.QMEncoder()
        st_e = bytearray(n_ctx)
        for c, b in zip(ctxs, bits):
            enc.encode(st_e, c, b)
        data = enc.flush()
        dec = ja.QMDecoder(data, 0)
        st_d = bytearray(n_ctx)
        got = [dec.decode(st_d, c) for c in ctxs]
        assert got == bits, trial
        # adaptive states must agree step-for-step too
        assert st_e == st_d


def test_qm_coder_carry_and_ff_paths():
    # all-LPS-at-start sequences drive carries and 0xFF stacking
    enc = ja.QMEncoder()
    st = bytearray(1)
    pattern = [1, 0] * 2000  # alternating at a skewed state
    for b in pattern:
        enc.encode(st, 0, b)
    data = enc.flush()
    # stuffing invariant: any 0xFF inside is followed by 0x00
    for i, b in enumerate(data[:-1]):
        if b == 0xFF:
            assert data[i + 1] == 0x00, i
    dec = ja.QMDecoder(data, 0)
    st2 = bytearray(1)
    assert [dec.decode(st2, 0) for _ in pattern] == pattern


# ------------------------------------------------------------- images


def _images():
    rng = np.random.RandomState(11)
    grad = (np.add.outer(np.arange(24) * 3, np.arange(40) * 2) % 256)
    return {
        "flat": np.full((24, 40), 128, np.uint8),
        "grad": grad.astype(np.uint8),
        "noise": rng.randint(0, 256, (32, 48)).astype(np.uint8),
        "rgb": np.stack([grad, 255 - grad, grad // 2], -1).astype(np.uint8),
        "odd": rng.randint(0, 256, (17, 23)).astype(np.uint8),
    }


def test_arith_decode_equals_huffman_pipeline():
    """Entropy layers must be pixel-equivalent: same DCT/quant path,
    different coding only."""
    for name, img in _images().items():
        for q in (75, 90):
            a = ic.decode_jpeg(ic.encode_jpeg_arith(img, quality=q))
            h = ic.decode_jpeg(ic.encode_jpeg(img, quality=q))
            assert np.array_equal(a, h), (name, q)
    # 4:2:0 subsampled MCUs (multi-block interleave)
    img = _images()["rgb"]
    a = ic.decode_jpeg(ic.encode_jpeg_arith(img, quality=90, subsample=True))
    h = ic.decode_jpeg(ic.encode_jpeg(img, quality=90, subsample=True))
    assert np.array_equal(a, h)


def test_arith_actually_compresses_better():
    img = _images()["grad"]
    assert len(ic.encode_jpeg_arith(img, 90)) < len(ic.encode_jpeg(img, 90))


def test_system_libjpeg_decodes_our_arith_bytes():
    """The decisive cross-check: the system libjpeg (the reference QM
    implementation) must accept our SOF9 bytes and agree within the
    same ±1 ISLOW-IDCT calibration as the Huffman cross-checks
    (exactly 0 on flat/smooth content)."""
    for name, img in _images().items():
        if img.ndim == 3:
            continue  # chroma upsampler divergence is the documented
            # out-of-scope class (see test_imgcodecs_pixbuf_crossval)
        data = ic.encode_jpeg_arith(img, quality=90)
        sys_px = _pixbuf_file_decode(data)
        if sys_px is None:
            pytest.skip("gdk-pixbuf not available")
        assert not isinstance(sys_px, str), f"{name}: system rejected"
        mine = ic.decode_jpeg(data)
        diff = np.abs(sys_px[:, :, 0].astype(int) - mine.astype(int))
        limit = 0 if name in ("flat", "grad") else 1
        assert diff.max() <= limit, (name, int(diff.max()))


# ---------------------------------------------------------- structure


def test_lossless_stays_a_named_rejection():
    img = np.full((8, 8), 100, np.uint8)
    data = bytearray(ic.encode_jpeg_arith(img))
    i = data.find(b"\xff\xc9")
    data[i + 1] = 0xC3  # SOF3: lossless
    with pytest.raises(ValueError, match="lossless"):
        ic.decode_jpeg(bytes(data))
    data[i + 1] = 0xCA  # SOF10 frame over a sequential-scan body:
    # accepted as a frame type now, but the scan parameters (Ss=0,
    # Se=63) are illegal for a progressive DC scan
    with pytest.raises(ValueError, match="spectral"):
        ic.decode_jpeg(bytes(data))


# ------------------------------------------- progressive / multi-scan


def test_progressive_arith_equals_huffman_pipeline():
    """SOF10 must be pixel-equivalent to the sequential pipelines:
    progressive reconstruction is exact, only the entropy layering
    differs."""
    for name, img in _images().items():
        p = ic.decode_jpeg(ic.encode_jpeg_arith_progressive(img, quality=90))
        h = ic.decode_jpeg(ic.encode_jpeg(img, quality=90))
        assert np.array_equal(p, h), name
    img = _images()["rgb"]
    p = ic.decode_jpeg(
        ic.encode_jpeg_arith_progressive(img, quality=90, subsample=True))
    h = ic.decode_jpeg(ic.encode_jpeg(img, quality=90, subsample=True))
    assert np.array_equal(p, h)


def test_arith_restart_and_multiscan_round_trip():
    """Restart intervals (fresh QM stream + re-zeroed statistics per
    segment) and non-interleaved multi-scan layouts, both entropy
    coders."""
    img = _images()["rgb"]
    h = ic.decode_jpeg(ic.encode_jpeg(img, quality=85, subsample=True))
    variants = [
        ic.encode_jpeg_arith(img, 85, subsample=True, restart_interval=2),
        ic.encode_jpeg_arith(img, 85, subsample=True, interleave=False),
        ic.encode_jpeg_arith_progressive(
            img, 85, subsample=True, restart_interval=3),
        ic.encode_jpeg_multiscan(img, 85, subsample=True),
        ic.encode_jpeg_multiscan(img, 85, subsample=True,
                                 restart_interval=2),
    ]
    for i, data in enumerate(variants):
        assert np.array_equal(ic.decode_jpeg(data), h), i


def test_system_libjpeg_decodes_our_sof10_and_restart_bytes():
    """Cross-check for the new bitstream shapes: the system libjpeg
    must accept our SOF10 / restart-arith / multi-scan bytes and agree
    within the usual ±1 ISLOW-IDCT calibration (0 on smooth)."""
    for name, img in _images().items():
        if img.ndim == 3:
            continue
        for label, data in (
            ("sof10", ic.encode_jpeg_arith_progressive(img, quality=90)),
            ("sof10-rst", ic.encode_jpeg_arith_progressive(
                img, quality=90, restart_interval=2)),
            ("sof9-rst", ic.encode_jpeg_arith(
                img, quality=90, restart_interval=3)),
            ("multiscan", ic.encode_jpeg_multiscan(img, quality=90)),
        ):
            sys_px = _pixbuf_file_decode(data)
            if sys_px is None:
                pytest.skip("gdk-pixbuf not available")
            assert not isinstance(sys_px, str), f"{name}/{label}: rejected"
            mine = ic.decode_jpeg(data)
            diff = np.abs(sys_px[:, :, 0].astype(int) - mine.astype(int))
            limit = 0 if name in ("flat", "grad") else 1
            assert diff.max() <= limit, (name, label, int(diff.max()))


def test_sof10_garbage_and_truncation_never_crash():
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    data = ic.encode_jpeg_arith_progressive(img, quality=85,
                                            restart_interval=2)
    r = random.Random(29)
    for _ in range(300):
        m = bytearray(data)
        m[r.randrange(len(m))] ^= 1 << r.randrange(8)
        try:
            out = ic.decode_jpeg(bytes(m))
            assert out.shape[0] > 0
        except ValueError:
            pass
    for cut in range(0, len(data), 7):
        try:
            ic.decode_jpeg(data[:cut])
        except ValueError:
            pass


def test_bad_dac_raises():
    img = np.full((8, 8), 100, np.uint8)
    data = bytearray(ic.encode_jpeg_arith(img))
    i = data.find(b"\xff\xcc")
    # segment: FF CC len2 cc(DC) val cc(AC) val → AC val at i+7
    data[i + 7] = 64  # AC Kx out of range (1..63)
    with pytest.raises(ValueError, match="DAC|conditioning"):
        ic.decode_jpeg(bytes(data))


def test_garbage_and_truncation_never_crash():
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    data = ic.encode_jpeg_arith(img, quality=85)
    # arithmetic entropy data has no CRC (same as Huffman JPEG):
    # flips/truncations either raise ValueError or decode to an image
    r = random.Random(17)
    for _ in range(300):
        m = bytearray(data)
        m[r.randrange(len(m))] ^= 1 << r.randrange(8)
        try:
            out = ic.decode_jpeg(bytes(m))
            assert out.shape[0] > 0
        except ValueError:
            pass
    for cut in range(0, len(data), 5):
        try:
            ic.decode_jpeg(data[:cut])
        except ValueError:
            pass
