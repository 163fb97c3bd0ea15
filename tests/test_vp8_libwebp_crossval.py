"""Cross-validation of the VP8 still codec against the SYSTEM libwebp.

The strongest evidence tier for kernels/vp8: real libwebp encodes
arbitrary images (its encoder makes its own mode/segmentation/filter
decisions we don't control), and our decoder must reconstruct
BIT-IDENTICAL Y/U/V planes — VP8 decoding is normative, so any
divergence is a bug on one side. Comparing YUV (WebPDecodeYUV) rather
than RGB sidesteps the one documented divergence (libwebp's fancy
chroma upsampler vs our nearest-neighbor).

Also runs the reverse direction: libwebp must decode OUR fixture
encoder's bitstreams to the same planes our decoder produces — so the
entire fixture corpus (multimodal media rows, webm tracks, animated
WebP) is certified against the reference implementation, not just
self-consistent.

Skips cleanly when no libwebp shared object is installed (these tests
are a validation amplifier, not the base coverage — that lives in
tests/test_vp8.py / test_webp.py and is system-independent)."""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from ragflow_ocr_spark.kernels import vp8, webp


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so.6", "libwebp.so",
                 ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


_LW = _load_libwebp()
pytestmark = pytest.mark.skipif(_LW is None,
                                reason="system libwebp not available")

if _LW is not None:
    _LW.WebPEncodeRGB.restype = ctypes.c_size_t
    _LW.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
    _LW.WebPEncodeRGBA.restype = ctypes.c_size_t
    _LW.WebPEncodeRGBA.argtypes = _LW.WebPEncodeRGB.argtypes
    _LW.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    _LW.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _LW.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _LW.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _LW.WebPFree.argtypes = [ctypes.c_void_p]


def _lw_encode_rgb(rgb: np.ndarray, quality: float) -> bytes:
    h, w, _ = rgb.shape
    out = ctypes.c_void_p()
    size = _LW.WebPEncodeRGB(np.ascontiguousarray(rgb).tobytes(),
                             w, h, w * 3, quality, ctypes.byref(out))
    assert size > 0
    buf = ctypes.string_at(out, size)
    _LW.WebPFree(out)
    return buf


def _lw_encode_rgba(rgba: np.ndarray, quality: float) -> bytes:
    h, w, _ = rgba.shape
    out = ctypes.c_void_p()
    size = _LW.WebPEncodeRGBA(np.ascontiguousarray(rgba).tobytes(),
                              w, h, w * 4, quality, ctypes.byref(out))
    assert size > 0
    buf = ctypes.string_at(out, size)
    _LW.WebPFree(out)
    return buf


def _lw_decode_yuv(buf: bytes):
    wi, hi = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    yp = _LW.WebPDecodeYUV(buf, len(buf), ctypes.byref(wi),
                           ctypes.byref(hi), ctypes.byref(up),
                           ctypes.byref(vp), ctypes.byref(stride),
                           ctypes.byref(uv_stride))
    assert yp, "libwebp failed to decode"
    w, h = wi.value, hi.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    Y = np.ctypeslib.as_array(yp, shape=(h, stride.value))[:, :w].copy()
    U = np.ctypeslib.as_array(up, shape=(ch, uv_stride.value))[:, :cw].copy()
    V = np.ctypeslib.as_array(vp, shape=(ch, uv_stride.value))[:, :cw].copy()
    _LW.WebPFree(ctypes.cast(yp, ctypes.c_void_p))
    return Y, U, V


def _my_decode_yuv(buf: bytes):
    pos, vp8data = 12, None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", buf, pos + 4)
        if tag == b"VP8 ":
            vp8data = buf[pos + 8:pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    assert vp8data is not None
    _hdr, Y, U, V, w, h, _r, _c = vp8._decode_keyframe(vp8data)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    return (Y[1:h + 1, 1:w + 1].astype(np.uint8),
            U[1:ch + 1, 1:cw + 1].astype(np.uint8),
            V[1:ch + 1, 1:cw + 1].astype(np.uint8))


def _images():
    rng = np.random.RandomState(99)
    x = np.arange(96)[None, :]
    y = np.arange(80)[:, None]
    grad = np.stack([(x * 3 + y * 2) % 256, (x + y * 4) % 256,
                     (255 - x * 2 + y) % 256], axis=-1).astype(np.uint8)
    noise = rng.randint(0, 256, size=(64, 64, 3)).astype(np.uint8)
    blocks = np.kron(rng.randint(0, 256, (5, 6, 3)),
                     np.ones((16, 16, 1))).astype(np.uint8)
    # odd dimensions exercise the mb-alignment crop
    odd = np.stack([((x[:, :77] * 5) % 256).repeat(1, axis=0)] * 3,
                   axis=-1)[:33].astype(np.uint8) \
        if False else grad[:33, :77]
    return [("grad", grad), ("noise", noise), ("blocks", blocks),
            ("odd", odd)]


@pytest.mark.parametrize("quality", [50.0, 75.0, 92.0])
def test_decode_matches_libwebp_bit_exact(quality):
    """Real libwebp encodes (its own segmentation/filter/mode
    decisions); our decode must be plane-identical."""
    for name, img in _images():
        buf = _lw_encode_rgb(img, quality)
        myY, myU, myV = _my_decode_yuv(buf)
        refY, refU, refV = _lw_decode_yuv(buf)
        assert np.array_equal(myY, refY), (name, quality, "Y")
        assert np.array_equal(myU, refU), (name, quality, "U")
        assert np.array_equal(myV, refV), (name, quality, "V")


def test_alpha_plane_matches_libwebp():
    """WebPEncodeRGBA emits an ALPH chunk (losslessly coded by
    default); our decode_alph must reproduce libwebp's alpha channel
    exactly."""
    x = np.arange(40)[None, :]
    y = np.arange(32)[:, None]
    rgba = np.zeros((32, 40, 4), np.uint8)
    rgba[..., 0] = (x * 4) % 256
    rgba[..., 1] = (y * 6) % 256
    rgba[..., 2] = 128
    rgba[..., 3] = np.minimum(255, (x + y) * 4).astype(np.uint8)
    buf = _lw_encode_rgba(rgba, 75.0)
    pos, alph = 12, None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", buf, pos + 4)
        if tag == b"ALPH":
            alph = buf[pos + 8:pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    assert alph is not None, "libwebp did not emit an ALPH chunk"
    mine = webp.decode_alph(alph, 40, 32)
    wi, hi = ctypes.c_int(), ctypes.c_int()
    p = _LW.WebPDecodeRGBA(buf, len(buf), ctypes.byref(wi),
                           ctypes.byref(hi))
    ref = np.ctypeslib.as_array(p, shape=(hi.value, wi.value, 4)).copy()
    _LW.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    assert np.array_equal(mine, ref[..., 3])


def test_libwebp_decodes_our_fixture_encoder_bitstreams():
    """Reverse direction: the in-repo fixture encoder's output must be
    accepted by the REFERENCE implementation and reconstruct the same
    planes our decoder produces — certifying the fixture corpus
    against libwebp, not just against ourselves."""
    rng = np.random.RandomState(17)
    mbs = []
    for i in range(3 * 2):
        y2 = [0] * 16
        y2[0] = int(rng.randint(-20, 20))
        yb = [[0] * 16 for _ in range(16)]
        for b in range(16):
            yb[b][1] = int(rng.randint(-9, 9))
        ym = (vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED)[i % 4]
        mbs.append({"ymode": ym, "uvmode": vp8.DC_PRED, "y": yb, "y2": y2})
    payload, _expected = vp8.encode_vp8_frame(48, 32, mbs,
                                              filter_level=12)
    buf = vp8.wrap_webp(payload)
    myY, myU, myV = _my_decode_yuv(buf)
    refY, refU, refV = _lw_decode_yuv(buf)
    assert np.array_equal(myY, refY)
    assert np.array_equal(myU, refU)
    assert np.array_equal(myV, refV)
    # and the flat fixture the media corpus uses everywhere
    flat = vp8.encode_webp_lossy_flat(32, 24, (137, 100, 180))
    myY, myU, myV = _my_decode_yuv(flat)
    refY, refU, refV = _lw_decode_yuv(flat)
    assert np.array_equal(myY, refY)
    assert np.array_equal(myU, refU)
    assert np.array_equal(myV, refV)
