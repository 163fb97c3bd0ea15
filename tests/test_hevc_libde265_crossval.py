"""Cross-validation of the HEVC keyframe layer against the SYSTEM
libde265 — the independent-implementation tier the H.264 sibling
could never get (no H.264 decoder exists on this host).

Two claims are falsified here:

1. Conformance: libde265 must reconstruct BIT-IDENTICAL Y/U/V planes
   from our encoder's PCM access units, at CTB-aligned AND cropped
   geometries. This exercises the whole stack an independent decoder
   sees: NAL/EPB layer, VPS/SPS/PPS fields, slice header, CABAC
   engine (context bin + terminate + flush), PCM alignment and the
   engine re-initialization after every PCM block — a single wrong
   bit anywhere breaks the comparison.
2. Table provenance: the module's RANGE_TAB_LPS / TRANS_IDX_LPS
   literals must equal the byte tables compiled into the system
   libde265 (the module doc cites their offsets; here we re-locate
   them by content so the pin survives library rebuilds).

Skips cleanly when libde265 is not installed (base coverage lives in
tests/test_hevc.py and is system-independent)."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from ragflow_ocr_spark.kernels import hevc


def _load_libde265():
    for name in ("libde265.so.0", "libde265.so",
                 ctypes.util.find_library("de265")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        for fname, res, args in [
            ("de265_new_decoder", ctypes.c_void_p, []),
            ("de265_push_data", ctypes.c_int,
             [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
              ctypes.c_longlong, ctypes.c_void_p]),
            ("de265_flush_data", ctypes.c_int, [ctypes.c_void_p]),
            ("de265_decode", ctypes.c_int,
             [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]),
            ("de265_get_next_picture", ctypes.c_void_p,
             [ctypes.c_void_p]),
            ("de265_release_next_picture", None, [ctypes.c_void_p]),
            ("de265_get_image_width", ctypes.c_int,
             [ctypes.c_void_p, ctypes.c_int]),
            ("de265_get_image_height", ctypes.c_int,
             [ctypes.c_void_p, ctypes.c_int]),
            ("de265_get_image_plane", ctypes.POINTER(ctypes.c_uint8),
             [ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]),
            ("de265_free_decoder", None, [ctypes.c_void_p]),
        ]:
            f = getattr(lib, fname)
            f.restype = res
            f.argtypes = args
        return lib
    return None


_LIB = _load_libde265()
pytestmark = pytest.mark.skipif(
    _LIB is None, reason="system libde265 not available")


def _de265_decode_planes(au: bytes):
    ctx = _LIB.de265_new_decoder()
    try:
        assert _LIB.de265_push_data(ctx, au, len(au), 0, None) == 0
        assert _LIB.de265_flush_data(ctx) == 0
        more = ctypes.c_int(1)
        img = None
        for _ in range(64):
            err = _LIB.de265_decode(ctx, ctypes.byref(more))
            assert err == 0, f"libde265 rejected our stream: err {err}"
            img = _LIB.de265_get_next_picture(ctx)
            if img or not more.value:
                break
        assert img, "libde265 produced no picture from our stream"
        planes = []
        for ch in range(3):
            w = _LIB.de265_get_image_width(img, ch)
            h = _LIB.de265_get_image_height(img, ch)
            stride = ctypes.c_int()
            p = _LIB.de265_get_image_plane(img, ch, ctypes.byref(stride))
            assert p, "null image plane"
            planes.append(
                np.ctypeslib.as_array(p, shape=(h, stride.value))[:, :w]
                .copy()
            )
        _LIB.de265_release_next_picture(ctx)
        return planes
    finally:
        _LIB.de265_free_decoder(ctx)


@pytest.mark.parametrize(
    "h,w",
    [
        (32, 32),    # single CTB
        (64, 96),    # CTB grid
        (30, 50),    # conformance-window crop on both axes
        (2, 2),      # minimum frame, maximum crop
        (98, 34),    # multi-row crop
    ],
)
def test_libde265_reconstructs_our_planes_bit_exactly(h, w):
    rng = np.random.default_rng(h * 7919 + w)
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    u = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
    v = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2), dtype=np.uint8)
    au = hevc.encode_hevc_ipcm_yuv(y, u, v)
    yd, ud, vd = _de265_decode_planes(au)
    # libde265 reports the conformance-cropped geometry
    assert yd.shape == (h, w)
    assert (yd == y).all(), "luma mismatch vs independent decoder"
    assert (ud == u).all(), "Cb mismatch vs independent decoder"
    assert (vd == v).all(), "Cr mismatch vs independent decoder"
    # and our own decoder agrees with libde265 (tripartite pin)
    y2, u2, v2 = hevc.decode_hevc_keyframe_yuv(au)
    assert (y2 == yd).all() and (u2 == ud).all() and (v2 == vd).all()


def test_many_seeds_stress_the_cabac_flush_alignment():
    """The flush/PCM-alignment interaction is the riskiest seam: every
    CTB re-runs init->bin->terminate->flush with a different split_cu
    context trajectory prefix. 20 random frames x 6 CTBs each gives
    libde265 120 independent chances to catch a mis-flushed bit."""
    for seed in range(20):
        rng = np.random.default_rng(1000 + seed)
        y = rng.integers(0, 256, (64, 96), dtype=np.uint8)
        u = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        v = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        au = hevc.encode_hevc_ipcm_yuv(y, u, v)
        yd, ud, vd = _de265_decode_planes(au)
        assert (yd == y).all() and (ud == u).all() and (vd == v).all()


def _find_table(blob: bytes, table: bytes) -> int:
    """Occurrences of `table` as a contiguous byte block."""
    n = 0
    start = 0
    while True:
        i = blob.find(table, start)
        if i < 0:
            return n
        n += 1
        start = i + 1


def test_cabac_tables_match_the_system_library_bytes():
    """RANGE_TAB_LPS / TRANS_IDX_LPS literals == the tables compiled
    into the installed libde265 (located by content, not offset)."""
    path = None
    for cand in ("/lib/x86_64-linux-gnu/libde265.so.0",
                 "/usr/lib/x86_64-linux-gnu/libde265.so.0"):
        try:
            with open(cand, "rb") as f:
                blob = f.read()
            path = cand
            break
        except OSError:
            continue
    if path is None:
        pytest.skip("libde265 shared object not readable")
    lps = bytes(b for row in hevc.RANGE_TAB_LPS for b in row)
    assert _find_table(blob, lps) == 1, (
        "rangeTabLps literal does not match the system libde265")
    tlps = bytes(hevc.TRANS_IDX_LPS)
    assert _find_table(blob, tlps) >= 1, (
        "transIdxLps literal does not match the system libde265")


def test_split_cu_init_values_present_in_system_library():
    """The {139,141,157} split_cu_flag initValues cited in the module
    doc appear in libde265's context-init data (stored as u32s)."""
    import struct

    try:
        with open("/lib/x86_64-linux-gnu/libde265.so.0", "rb") as f:
            blob = f.read()
    except OSError:
        pytest.skip("libde265 shared object not readable")
    needle = struct.pack("<9I", 139, 141, 157, 107, 139, 126,
                         107, 139, 126)
    assert needle in blob
