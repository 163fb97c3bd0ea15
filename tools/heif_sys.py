"""ctypes bindings to the SYSTEM libheif (x265 encode + libde265
decode) — golden-generation and ground-truth harness for the HEVC
intra decoder.

This is a dev/test tool only: the engine itself never imports it.
Everything here produces fixtures or referee outputs; the from-scratch
decode path lives in ragflow_ocr_spark/kernels/hevc*.py.

All functions raise RuntimeError if the system libraries are absent so
callers (tests) can skip cleanly.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile

import numpy as np


class _HeifError(ctypes.Structure):
    _fields_ = [
        ("code", ctypes.c_int),
        ("subcode", ctypes.c_int),
        ("message", ctypes.c_char_p),
    ]


def _chk(err: _HeifError, what: str) -> None:
    if err.code != 0:
        raise RuntimeError(
            f"libheif {what} failed: code={err.code} "
            f"subcode={err.subcode} {err.message!r}")


_COLORSPACE_YCBCR = 0
_CHROMA_420 = 1
_CHANNELS = (0, 1, 2)  # Y, Cb, Cr
_COMPRESSION_HEVC = 1


def load_libheif():
    for name in ("libheif.so.1", "libheif.so",
                 ctypes.util.find_library("heif")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        proto = [
            ("heif_context_alloc", ctypes.c_void_p, []),
            ("heif_context_free", None, [ctypes.c_void_p]),
            ("heif_context_read_from_memory_without_copy", _HeifError,
             [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
              ctypes.c_void_p]),
            ("heif_context_get_primary_image_handle", _HeifError,
             [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]),
            ("heif_image_handle_release", None, [ctypes.c_void_p]),
            ("heif_decode_image", _HeifError,
             [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
              ctypes.c_int, ctypes.c_int, ctypes.c_void_p]),
            ("heif_image_release", None, [ctypes.c_void_p]),
            ("heif_image_get_plane_readonly",
             ctypes.POINTER(ctypes.c_uint8),
             [ctypes.c_void_p, ctypes.c_int,
              ctypes.POINTER(ctypes.c_int)]),
            ("heif_image_get_width", ctypes.c_int,
             [ctypes.c_void_p, ctypes.c_int]),
            ("heif_image_get_height", ctypes.c_int,
             [ctypes.c_void_p, ctypes.c_int]),
            ("heif_context_get_encoder_for_format", _HeifError,
             [ctypes.c_void_p, ctypes.c_int,
              ctypes.POINTER(ctypes.c_void_p)]),
            ("heif_encoder_release", None, [ctypes.c_void_p]),
            ("heif_encoder_set_lossy_quality", _HeifError,
             [ctypes.c_void_p, ctypes.c_int]),
            ("heif_encoder_set_lossless", _HeifError,
             [ctypes.c_void_p, ctypes.c_int]),
            ("heif_encoder_set_parameter_string", _HeifError,
             [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]),
            ("heif_image_create", _HeifError,
             [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
              ctypes.POINTER(ctypes.c_void_p)]),
            ("heif_image_add_plane", _HeifError,
             [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
              ctypes.c_int, ctypes.c_int]),
            ("heif_image_get_plane", ctypes.POINTER(ctypes.c_uint8),
             [ctypes.c_void_p, ctypes.c_int,
              ctypes.POINTER(ctypes.c_int)]),
            ("heif_context_encode_image", _HeifError,
             [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
              ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]),
            ("heif_context_write_to_file", _HeifError,
             [ctypes.c_void_p, ctypes.c_char_p]),
        ]
        try:
            for fname, res, args in proto:
                f = getattr(lib, fname)
                f.restype = res
                f.argtypes = args
        except AttributeError:
            continue
        return lib
    return None


_LIB = load_libheif()


def have_libheif() -> bool:
    return _LIB is not None


def encode_heic_yuv420(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                       quality: int = 50,
                       x265_params: dict[str, str] | None = None,
                       lossless: bool = False) -> bytes:
    """Encode 8-bit 4:2:0 planes to a real HEIC via the system
    libheif+x265. `x265_params` are forwarded with the plugin's
    "x265:" passthrough (e.g. {"wpp": "0", "sao": "0"})."""
    if _LIB is None:
        raise RuntimeError("system libheif not available")
    h, w = y.shape
    assert cb.shape == cr.shape == ((h + 1) // 2, (w + 1) // 2)
    ctx = _LIB.heif_context_alloc()
    img = ctypes.c_void_p()
    enc = ctypes.c_void_p()
    try:
        _chk(_LIB.heif_context_get_encoder_for_format(
            ctx, _COMPRESSION_HEVC, ctypes.byref(enc)), "get_encoder")
        if lossless:
            _chk(_LIB.heif_encoder_set_lossless(enc, 1), "lossless")
        _chk(_LIB.heif_encoder_set_lossy_quality(enc, quality),
             "quality")
        for k, v in (x265_params or {}).items():
            _chk(_LIB.heif_encoder_set_parameter_string(
                enc, f"x265:{k}".encode(), str(v).encode()),
                f"param {k}")
        _chk(_LIB.heif_image_create(
            w, h, _COLORSPACE_YCBCR, _CHROMA_420, ctypes.byref(img)),
            "image_create")
        for ch, plane in zip(_CHANNELS, (y, cb, cr)):
            ph, pw = plane.shape
            _chk(_LIB.heif_image_add_plane(img, ch, pw, ph, 8),
                 "add_plane")
            stride = ctypes.c_int()
            ptr = _LIB.heif_image_get_plane(img, ch,
                                            ctypes.byref(stride))
            buf = np.ctypeslib.as_array(ptr, (ph, stride.value))
            buf[:, :pw] = plane
        _chk(_LIB.heif_context_encode_image(ctx, img, enc, None, None),
             "encode_image")
        fd, path = tempfile.mkstemp(suffix=".heic")
        os.close(fd)
        try:
            _chk(_LIB.heif_context_write_to_file(ctx, path.encode()),
                 "write")
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)
    finally:
        if img:
            _LIB.heif_image_release(img)
        if enc:
            _LIB.heif_encoder_release(enc)
        _LIB.heif_context_free(ctx)


def decode_heic_yuv420(data: bytes):
    """Ground-truth decode: primary item → (Y, Cb, Cr) uint8 planes
    via libheif (libde265 underneath)."""
    if _LIB is None:
        raise RuntimeError("system libheif not available")
    ctx = _LIB.heif_context_alloc()
    handle = ctypes.c_void_p()
    img = ctypes.c_void_p()
    buf = ctypes.create_string_buffer(data, len(data))
    try:
        _chk(_LIB.heif_context_read_from_memory_without_copy(
            ctx, buf, len(data), None), "read")
        _chk(_LIB.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(handle)), "primary")
        _chk(_LIB.heif_decode_image(
            handle, ctypes.byref(img), _COLORSPACE_YCBCR, _CHROMA_420,
            None), "decode")
        planes = []
        for ch in _CHANNELS:
            pw = _LIB.heif_image_get_width(img, ch)
            ph = _LIB.heif_image_get_height(img, ch)
            stride = ctypes.c_int()
            ptr = _LIB.heif_image_get_plane_readonly(
                img, ch, ctypes.byref(stride))
            arr = np.ctypeslib.as_array(ptr, (ph, stride.value))
            planes.append(arr[:, :pw].copy())
        return tuple(planes)
    finally:
        if img:
            _LIB.heif_image_release(img)
        if handle:
            _LIB.heif_image_handle_release(handle)
        _LIB.heif_context_free(ctx)
