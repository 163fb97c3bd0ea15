"""Cross-validation of kernels/pngcodec against the SYSTEM libpng16.

Same validation tier as tests/test_vp8_libwebp_crossval.py: the
reference implementation must read OUR encoder's output byte-exactly,
and we must decode REAL libpng-written files byte-exactly (libpng's
simplified API, via ctypes). Scope is 8-bit images — the simplified
API's 16-bit path converts through linear light, a different (equally
valid) convention than our cv2-style keep-high-byte rule, so 16-bit
stays covered by the hand-built foreign-encoder fixtures in
tests/test_kernels_ocr.py instead. Skips cleanly without libpng."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from ragflow_ocr_spark.kernels import pngcodec


class _PngImage(ctypes.Structure):
    _fields_ = [("opaque", ctypes.c_void_p), ("version", ctypes.c_uint32),
                ("width", ctypes.c_uint32), ("height", ctypes.c_uint32),
                ("format", ctypes.c_uint32), ("flags", ctypes.c_uint32),
                ("colormap_entries", ctypes.c_uint32),
                ("warning_or_error", ctypes.c_uint32),
                ("message", ctypes.c_char * 64)]


def _load_libpng():
    for name in ("libpng16.so.16", "libpng16.so", "libpng.so",
                 ctypes.util.find_library("png16"),
                 ctypes.util.find_library("png")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.png_image_begin_read_from_memory  # simplified API probe
            return lib
        except (OSError, AttributeError):
            continue
    return None


_LP = _load_libpng()
pytestmark = pytest.mark.skipif(_LP is None,
                                reason="system libpng16 not available")

_FMT_GRAY, _FMT_RGB, _FMT_RGBA = 0, 2, 3

if _LP is not None:
    _LP.png_image_begin_read_from_memory.restype = ctypes.c_int
    _LP.png_image_begin_read_from_memory.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_char_p, ctypes.c_size_t]
    _LP.png_image_finish_read.restype = ctypes.c_int
    _LP.png_image_finish_read.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p]
    _LP.png_image_write_to_memory.restype = ctypes.c_int
    _LP.png_image_write_to_memory.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p]


def _lp_read(data: bytes, fmt: int, channels: int) -> np.ndarray:
    im = _PngImage()
    im.version = 1
    assert _LP.png_image_begin_read_from_memory(
        ctypes.byref(im), data, len(data)), im.message
    im.format = fmt
    shape = ((im.height, im.width) if channels == 1
             else (im.height, im.width, channels))
    buf = np.zeros(shape, np.uint8)
    assert _LP.png_image_finish_read(
        ctypes.byref(im), None, buf.ctypes.data_as(ctypes.c_void_p),
        0, None), im.message
    return buf


def _lp_write(img: np.ndarray, fmt: int) -> bytes:
    im = _PngImage()
    im.version = 1
    im.height, im.width = img.shape[:2]
    im.format = fmt
    img = np.ascontiguousarray(img)
    size = ctypes.c_size_t(0)
    _LP.png_image_write_to_memory(ctypes.byref(im), None,
                                  ctypes.byref(size), 0,
                                  img.ctypes.data_as(ctypes.c_void_p),
                                  0, None)
    out = ctypes.create_string_buffer(size.value)
    assert _LP.png_image_write_to_memory(
        ctypes.byref(im), out, ctypes.byref(size), 0,
        img.ctypes.data_as(ctypes.c_void_p), 0, None), im.message
    return out.raw[:size.value]


def _gray_and_rgb_images():
    rng = np.random.RandomState(31)
    gray = rng.randint(0, 256, size=(19, 27)).astype(np.uint8)
    rgb = rng.randint(0, 256, size=(21, 33, 3)).astype(np.uint8)
    x = np.arange(40)[None, :]
    y = np.arange(24)[:, None]
    grad = np.stack([(x * 7 + y) % 256, (x + y * 9) % 256,
                     (x * 3 + y * 3) % 256], axis=-1).astype(np.uint8)
    return [("gray", gray), ("rgb", rgb), ("grad", grad)]


@pytest.mark.parametrize("interlace", [False, True])
def test_libpng_reads_our_encoder_byte_exact(interlace):
    for name, img in _gray_and_rgb_images():
        data = pngcodec.encode_png(img, interlace=interlace)
        fmt = _FMT_GRAY if img.ndim == 2 else _FMT_RGB
        ref = _lp_read(data, fmt, 1 if img.ndim == 2 else 3)
        assert np.array_equal(ref, img), (name, interlace)


def test_we_decode_libpng_written_files_byte_exact():
    for name, img in _gray_and_rgb_images():
        fmt = _FMT_GRAY if img.ndim == 2 else _FMT_RGB
        data = _lp_write(img, fmt)
        mine = pngcodec.decode_png(data)
        assert np.array_equal(mine, img), name


def test_rgba_from_libpng_drops_alpha_like_cv2():
    """An RGBA PNG written by libpng: our decoder drops alpha without
    compositing (the reference's cv2.IMREAD_COLOR convention) — RGB
    channels must match the source exactly."""
    rng = np.random.RandomState(7)
    rgba = rng.randint(0, 256, size=(15, 22, 4)).astype(np.uint8)
    data = _lp_write(rgba, _FMT_RGBA)
    mine = pngcodec.decode_png(data)
    assert mine.shape == (15, 22, 3)
    assert np.array_equal(mine, rgba[..., :3])
