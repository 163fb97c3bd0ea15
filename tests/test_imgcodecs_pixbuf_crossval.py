"""Cross-validation of BMP/TIFF/GIF/JPEG against gdk-pixbuf (libjpeg,
libtiff, and the pixbuf BMP/GIF loaders) via ctypes.

Same validation tier as the libwebp/libpng cross-checks: the system
reference implementations must read OUR encoders' output byte-exactly,
and we must decode THEIR writers' output byte-exactly (BMP/TIFF).
JPEG is tolerance-calibrated where the formats are genuinely
non-normative: libjpeg's ISLOW IDCT matches ours within ±1 on
achromatic content; chroma-noise images diverge through the upsampler
(libjpeg's triangular vs our replicate — the same documented
divergence class as libwebp's fancy upsampler), so color coverage
uses smooth chroma where both agree exactly.

Skips cleanly when gdk-pixbuf (or a needed loader) is absent.

IMPORTANT ctypes note: gdk_pixbuf_new_from_data does NOT copy — the
source buffer must outlive the pixbuf (a use-after-free here produces
exactly the kind of garbage-white corruption that looks like a codec
bug)."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from ragflow_ocr_spark.kernels import imgcodecs as ic


def _load_pixbuf():
    for name in ("libgdk_pixbuf-2.0.so.0", "libgdk_pixbuf-2.0.so",
                 ctypes.util.find_library("gdk_pixbuf-2.0")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


_GP = _load_pixbuf()
pytestmark = pytest.mark.skipif(_GP is None,
                                reason="gdk-pixbuf not available")

if _GP is not None:
    _GP.gdk_pixbuf_loader_new.restype = ctypes.c_void_p
    _GP.gdk_pixbuf_loader_write.restype = ctypes.c_int
    _GP.gdk_pixbuf_loader_write.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_void_p)]
    _GP.gdk_pixbuf_loader_close.restype = ctypes.c_int
    _GP.gdk_pixbuf_loader_close.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
    _GP.gdk_pixbuf_loader_get_pixbuf.restype = ctypes.c_void_p
    _GP.gdk_pixbuf_loader_get_pixbuf.argtypes = [ctypes.c_void_p]
    _GP.gdk_pixbuf_get_pixels.restype = ctypes.POINTER(ctypes.c_uint8)
    _GP.gdk_pixbuf_get_pixels.argtypes = [ctypes.c_void_p]
    for _f in ("gdk_pixbuf_get_width", "gdk_pixbuf_get_height",
               "gdk_pixbuf_get_rowstride", "gdk_pixbuf_get_n_channels"):
        getattr(_GP, _f).restype = ctypes.c_int
        getattr(_GP, _f).argtypes = [ctypes.c_void_p]
    _GP.gdk_pixbuf_new_from_data.restype = ctypes.c_void_p
    _GP.gdk_pixbuf_new_from_data.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_void_p]
    _GP.gdk_pixbuf_save_to_bufferv.restype = ctypes.c_int
    _GP.gdk_pixbuf_save_to_bufferv.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]


def _pixbuf_decode(data: bytes):
    """→ (h, w, nc) array or None if no loader handles the format."""
    err = ctypes.c_void_p()
    ld = _GP.gdk_pixbuf_loader_new()
    ok = _GP.gdk_pixbuf_loader_write(ld, data, len(data),
                                     ctypes.byref(err))
    ok2 = _GP.gdk_pixbuf_loader_close(ld, ctypes.byref(err))
    if not (ok and ok2):
        return None
    pb = _GP.gdk_pixbuf_loader_get_pixbuf(ld)
    if not pb:
        return None
    w, h = _GP.gdk_pixbuf_get_width(pb), _GP.gdk_pixbuf_get_height(pb)
    rs = _GP.gdk_pixbuf_get_rowstride(pb)
    nc = _GP.gdk_pixbuf_get_n_channels(pb)
    px = _GP.gdk_pixbuf_get_pixels(pb)
    return (np.ctypeslib.as_array(px, shape=(h, rs))[:, :w * nc]
            .reshape(h, w, nc).copy())


def _pixbuf_encode(rgb: np.ndarray, fmt: str, **opts):
    h, w, _ = rgb.shape
    raw = np.ascontiguousarray(rgb).tobytes()  # MUST outlive the pixbuf
    pb = _GP.gdk_pixbuf_new_from_data(raw, 0, 0, 8, w, h, w * 3,
                                      None, None)
    buf = ctypes.c_char_p()
    sz = ctypes.c_size_t()
    err = ctypes.c_void_p()
    keys = (ctypes.c_char_p * (len(opts) + 1))(
        *[k.encode() for k in opts], None)
    vals = (ctypes.c_char_p * (len(opts) + 1))(
        *[str(v).encode() for v in opts.values()], None)
    ok = _GP.gdk_pixbuf_save_to_bufferv(pb, ctypes.byref(buf),
                                        ctypes.byref(sz), fmt.encode(),
                                        keys, vals, ctypes.byref(err))
    out = ctypes.string_at(buf, sz.value) if ok else None
    del raw
    return out


def _skip_if_none(x, what):
    if x is None:
        pytest.skip(f"gdk-pixbuf cannot handle {what} on this system")
    return x


_RNG = np.random.RandomState(41)
_RGB = _RNG.randint(0, 256, size=(17, 23, 3)).astype(np.uint8)
_GRAY = _RNG.randint(0, 256, size=(19, 27)).astype(np.uint8)


def test_pixbuf_reads_our_bmp_tiff_gif_exact():
    for name, data, src in (
        ("bmp", ic.encode_bmp(_RGB), _RGB),
        ("tiff", ic.encode_tiff(_RGB), _RGB),
        ("gif", ic.encode_gif(_GRAY), _GRAY),
        ("gif_interlaced", ic.encode_gif(_GRAY, interlace=True), _GRAY),
    ):
        ref = _skip_if_none(_pixbuf_decode(data), name)[..., :3]
        if src.ndim == 2:
            assert np.array_equal(ref[..., 0], src), name
            assert np.array_equal(ref[..., 0], ref[..., 1]), name
        else:
            assert np.array_equal(ref, src), name


def test_we_read_pixbuf_written_bmp_tiff_exact():
    for fmt, dec in (("bmp", ic.decode_bmp), ("tiff", ic.decode_tiff)):
        data = _skip_if_none(_pixbuf_encode(_RGB, fmt), fmt)
        assert np.array_equal(dec(data), _RGB), fmt


def test_jpeg_matches_libjpeg_within_idct_tolerance():
    """Our baseline JPEG decode vs libjpeg (via pixbuf) on the SAME
    libjpeg-written file: flat and smooth-chroma images agree exactly;
    achromatic noise within ±1 (ISLOW IDCT rounding)."""
    x = np.arange(32)[None, :]
    y = np.arange(24)[:, None]
    flat = np.full((24, 32, 3), 137, np.uint8)
    smooth = np.stack([((x * 2 + y) % 256 // 2 + 60)] * 3,
                      axis=-1).astype(np.uint8)
    ach = np.stack([_RNG.randint(0, 256, size=(24, 32))
                    .astype(np.uint8)] * 3, axis=-1)
    for name, img, tol in (("flat", flat, 0), ("smooth", smooth, 0),
                           ("achromatic_noise", ach, 1)):
        data = _skip_if_none(_pixbuf_encode(img, "jpeg", quality=95),
                             "jpeg")
        mine = ic.decode_jpeg(data)
        if mine.ndim == 2:
            mine = np.stack([mine] * 3, axis=-1)
        ref = _pixbuf_decode(data)[..., :3]
        d = int(np.abs(mine.astype(int) - ref.astype(int)).max())
        assert d <= tol, (name, d)


def test_libjpeg_reads_our_progressive_and_baseline_jpeg():
    """Reverse direction for JPEG: libjpeg must decode OUR encoders'
    output; constant-value frames are lossless at quality 95 so the
    comparison is exact."""
    img = np.full((24, 32), 181, np.uint8)
    for name, data in (
        ("baseline", ic.encode_jpeg(img, quality=95)),
        ("progressive", ic.encode_jpeg_progressive(img, quality=95)),
    ):
        ref = _skip_if_none(_pixbuf_decode(data), name)[..., 0]
        assert (ref == 181).all(), name
