"""HEVC low-delay P layer (kernels/hevc_inter.py) tests.

The lossless GOP encoder is the falsifier harness: it emits skip,
merge, AMVP-MV, residual-coded and forced-intra CUs inside P slices,
and the decoders must reconstruct every frame byte-exactly — our own
(always) and the system libde265 (live tier), the independent referee
that caught the mvd-gt1 context-table layout during development.
"""

from __future__ import annotations

import ctypes
import os
import sys

import numpy as np
import pytest

from ragflow_ocr_spark.kernels import hevc, hevc_inter

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

try:
    from test_hevc_libde265_crossval import _LIB
    _LIVE = _LIB is not None
except Exception:  # pragma: no cover
    _LIVE = False

live = pytest.mark.skipif(not _LIVE, reason="system libde265 missing")


def _gop(seed=33, h=50, w=70, n_frames=8):
    rng = np.random.default_rng(seed)
    ch, cw = (h + 1) // 2, (w + 1) // 2
    frames = [(rng.integers(0, 256, (h, w)).astype(np.uint8),
               rng.integers(0, 256, (ch, cw)).astype(np.uint8),
               rng.integers(0, 256, (ch, cw)).astype(np.uint8))]
    for k in range(1, n_frames):
        py, pu, pv = frames[-1]
        if k % 3 == 1:    # global even horizontal shift -> AMVP/skip
            nxt = (np.roll(py, 2, axis=1), np.roll(pu, 1, axis=1),
                   np.roll(pv, 1, axis=1))
        elif k % 3 == 2:  # static + changed block -> skip + residual
            y2 = py.copy()
            bh, bw = min(16, h - 8), min(16, w - 8)
            y2[8:8 + bh, 8:8 + bw] = rng.integers(0, 256, (bh, bw))
            nxt = (y2, pu.copy(), pv.copy())
        else:             # vertical shift
            nxt = (np.roll(py, -4, axis=0), np.roll(pu, -2, axis=0),
                   np.roll(pv, -2, axis=0))
        frames.append(nxt)
    return frames


@pytest.mark.parametrize("intra_every", [0, 5])
def test_gop_roundtrip_self(intra_every):
    frames = _gop()
    au = hevc_inter.encode_hevc_lossless_gop_yuv(
        frames, intra_every=intra_every)
    out = hevc_inter.decode_hevc_gop_yuv(au)
    assert len(out) == len(frames)
    for (ey, eu, ev), (dy, du, dv) in zip(frames, out):
        assert np.array_equal(dy, ey)
        assert np.array_equal(du, eu)
        assert np.array_equal(dv, ev)


def test_sequence_decoder_per_au():
    frames = _gop(seed=5, h=32, w=48, n_frames=4)
    aus = hevc_inter.encode_hevc_lossless_gop_aus(frames)
    assert len(aus) == len(frames)
    dec = hevc_inter.HevcSequenceDecoder()
    for (ey, eu, ev), au in zip(frames, aus):
        dy, du, dv = dec.decode_au_yuv(au)
        assert np.array_equal(dy, ey)
        assert np.array_equal(du, eu)
        assert np.array_equal(dv, ev)


def test_trailing_picture_before_idr_raises():
    frames = _gop(seed=5, h=32, w=48, n_frames=3)
    aus = hevc_inter.encode_hevc_lossless_gop_aus(frames)
    dec = hevc_inter.HevcSequenceDecoder()
    with pytest.raises(ValueError):
        dec.decode_au_yuv(aus[0].split(b"\x00\x00\x00\x01")[1]
                          and aus[1])  # P AU without any prior IDR


def test_truncated_p_au_raises_loudly():
    frames = _gop(seed=7, h=32, w=48, n_frames=3)
    au = hevc_inter.encode_hevc_lossless_gop_yuv(frames)
    for frac in (0.4, 0.7, 0.95):
        with pytest.raises((ValueError, NotImplementedError)):
            hevc_inter.decode_hevc_gop_yuv(au[: int(len(au) * frac)])


def test_bitflip_fuzz_p_frames():
    frames = _gop(seed=9, h=32, w=48, n_frames=3)
    au = bytearray(hevc_inter.encode_hevc_lossless_gop_yuv(frames))
    rng = np.random.default_rng(3)
    for _ in range(16):
        mut = bytearray(au)
        i = int(rng.integers(len(au) // 2, len(au)))
        mut[i] ^= int(rng.integers(1, 256))
        try:
            hevc_inter.decode_hevc_gop_yuv(bytes(mut))
        except (ValueError, NotImplementedError):
            pass


def test_edge_bs_derivation_vectors():
    """8.7.2.4 boundary-strength unit vectors on a hand-built decoder
    state: intra side -> 2; nonzero coeffs -> 1; |mv diff| >= one
    luma sample -> 1; otherwise 0."""
    sps_rbsp = hevc_inter._sps_lossless_rbsp(32, 32, 0, 0)
    sps = hevc.parse_sps(sps_rbsp)
    pps = hevc.parse_pps(hevc_inter._pps_lossless_rbsp())
    ref = (np.zeros((32, 32), np.uint8), np.zeros((16, 16), np.uint8),
           np.zeros((16, 16), np.uint8))
    d = hevc_inter.PSliceDecoder(sps, pps, ref)
    # vertical edge at x=8, segment rows 0..3: p block (x=4..7),
    # q block (x=8..11) in 4x4 units -> p=(0,1), q=(0,2)
    d.intra4[:, :] = False
    assert d._edge_bs(True, 8, 0) == 0
    d.mv4[0, 2] = (16, 0)   # q side moves 4 luma samples
    assert d._edge_bs(True, 8, 0) == 1
    d.mv4[0, 2] = (2, 0)    # sub-sample difference only
    assert d._edge_bs(True, 8, 0) == 0
    d.cbf4[0, 1] = True     # p side carries coefficients
    assert d._edge_bs(True, 8, 0) == 1
    d.intra4[0, 2] = True   # q side intra
    assert d._edge_bs(True, 8, 0) == 2


@live
def test_gop_libde265_crossval():
    """The system libde265 must reconstruct every frame of our GOP
    streams byte-exactly — skip, merge, AMVP MVs, residual CUs and
    forced-intra CUs in P slices all falsified independently."""
    def de265_all(au):
        L = _LIB
        ctx = L.de265_new_decoder()
        try:
            assert L.de265_push_data(ctx, au, len(au), 0, None) == 0
            assert L.de265_flush_data(ctx) == 0
            pics = []
            more = ctypes.c_int(1)
            for _ in range(400):
                L.de265_decode(ctx, ctypes.byref(more))
                img = L.de265_get_next_picture(ctx)
                if img:
                    planes = []
                    for ch in range(3):
                        w = L.de265_get_image_width(img, ch)
                        h = L.de265_get_image_height(img, ch)
                        stride = ctypes.c_int()
                        ptr = L.de265_get_image_plane(
                            img, ch, ctypes.byref(stride))
                        planes.append(np.frombuffer(
                            ctypes.string_at(ptr, stride.value * h),
                            np.uint8).reshape(
                                h, stride.value)[:, :w].copy())
                    pics.append(planes)
                    L.de265_release_next_picture(ctx)
                if not more.value and not img:
                    break
            return pics
        finally:
            L.de265_free_decoder(ctx)

    for intra_every in (0, 5):
        frames = _gop(n_frames=6)
        au = hevc_inter.encode_hevc_lossless_gop_yuv(
            frames, intra_every=intra_every)
        pics = de265_all(au)
        assert len(pics) == len(frames)
        for (ey, eu, ev), p in zip(frames, pics):
            assert np.array_equal(p[0], ey)
            assert np.array_equal(p[1], eu)
            assert np.array_equal(p[2], ev)


@live
def test_p_context_tables_pinned_against_libde265():
    """Every P-slice initValue tuple must appear in the system
    libde265 binary (u32 layout; the 2-type inter elements appear as
    their (P, B) pairs)."""
    import struct

    path = None
    for cand in ("/lib/x86_64-linux-gnu/libde265.so.0",
                 "/usr/lib/x86_64-linux-gnu/libde265.so.0"):
        if os.path.exists(cand):
            path = cand
    if path is None:
        pytest.skip("libde265 shared object not found on disk")
    blob = open(path, "rb").read()
    t = hevc_inter._INIT_P
    # 3-type tables: the P row must appear (inside the I,P,B layout)
    for name in ("split_cu", "split_tr", "csbf", "sig", "gt1", "gt2",
                 "last_x", "cbf_chroma", "part_mode"):
        pat = struct.pack("<%dI" % len(t[name]), *t[name])
        assert blob.find(pat) >= 0, f"P init table {name} not in .so"
    # inter elements with their (P, B) pair layouts
    pairs = [
        struct.pack("<6I", 197, 185, 201, 197, 185, 201),  # cu_skip
        struct.pack("<2I", 149, 134),                      # pred_mode
        struct.pack("<2I", 110, 154),                      # merge_flag
        struct.pack("<2I", 122, 137),                      # merge_idx
        struct.pack("<4I", 140, 198, 169, 198),            # mvd P/B
        struct.pack("<2I", 79, 168),               # rqt_root + mvp
    ]
    for pat in pairs:
        assert blob.find(pat) >= 0


def test_video_gop_mp4_route():
    """An mp4 hvc1 track carrying IDR + P pictures decodes through
    the stateful container route, frame-exact."""
    from ragflow_ocr_spark.kernels.pngcodec import decode_png
    from ragflow_ocr_spark.ops.multimodal import (encode_mp4_hvc1,
                                                  iter_video_frames)

    frames = _gop(seed=11, h=24, w=32, n_frames=4)
    aus = hevc_inter.encode_hevc_lossless_gop_aus(frames,
                                                  intra_every=3)
    payload = encode_mp4_hvc1(aus, 32, 24)
    from ragflow_ocr_spark.kernels.h264 import _yuv_to_rgb
    for (ey, eu, ev), fr in zip(frames, iter_video_frames(payload)):
        img = decode_png(fr)
        assert np.array_equal(img, _yuv_to_rgb(ey, eu, ev))


def test_fractional_mv_roundtrip_self():
    """Quarter-pel luma / eighth-pel chroma MC: residual-corrected
    fractional MVs round-trip byte-exactly through our decoder."""
    frames = _gop(seed=55, h=48, w=64, n_frames=5)
    au = hevc_inter.encode_hevc_lossless_gop_yuv(
        frames, intra_every=7, frac_mv_every=2)
    out = hevc_inter.decode_hevc_gop_yuv(au)
    for (ey, eu, ev), (dy, du, dv) in zip(frames, out):
        assert np.array_equal(dy, ey)
        assert np.array_equal(du, eu)
        assert np.array_equal(dv, ev)


@live
def test_fractional_mv_libde265_crossval():
    """libde265 must agree on fractional-pel streams — a wrong
    interpolation filter tap or intermediate shift makes its
    prediction (and hence recon) diverge from the residual-corrected
    source."""
    def de265_all(au):
        L = _LIB
        ctx = L.de265_new_decoder()
        try:
            assert L.de265_push_data(ctx, au, len(au), 0, None) == 0
            assert L.de265_flush_data(ctx) == 0
            pics = []
            more = ctypes.c_int(1)
            for _ in range(400):
                L.de265_decode(ctx, ctypes.byref(more))
                img = L.de265_get_next_picture(ctx)
                if img:
                    planes = []
                    for ch in range(3):
                        w = L.de265_get_image_width(img, ch)
                        h = L.de265_get_image_height(img, ch)
                        stride = ctypes.c_int()
                        ptr = L.de265_get_image_plane(
                            img, ch, ctypes.byref(stride))
                        planes.append(np.frombuffer(
                            ctypes.string_at(ptr, stride.value * h),
                            np.uint8).reshape(
                                h, stride.value)[:, :w].copy())
                    pics.append(planes)
                    L.de265_release_next_picture(ctx)
                if not more.value and not img:
                    break
            return pics
        finally:
            L.de265_free_decoder(ctx)

    frames = _gop(seed=55, h=48, w=64, n_frames=5)
    au = hevc_inter.encode_hevc_lossless_gop_yuv(
        frames, intra_every=7, frac_mv_every=2)
    pics = de265_all(au)
    assert len(pics) == len(frames)
    for (ey, eu, ev), p in zip(frames, pics):
        assert np.array_equal(p[0], ey)
        assert np.array_equal(p[1], eu)
        assert np.array_equal(p[2], ev)


def test_main10_gop_roundtrip_self():
    rng = np.random.default_rng(8)
    h, w = 34, 50
    frames = [(rng.integers(0, 1024, (h, w)).astype(np.uint16),
               rng.integers(0, 1024, (17, 25)).astype(np.uint16),
               rng.integers(0, 1024, (17, 25)).astype(np.uint16))]
    for _ in range(3):
        py, pu, pv = frames[-1]
        frames.append((np.roll(py, 2, axis=1), np.roll(pu, 1, axis=1),
                       pv.copy()))
    au = hevc_inter.encode_hevc_lossless_gop_yuv(
        frames, frac_mv_every=2, bit_depth=10)
    out = hevc_inter.decode_hevc_gop_yuv(au)
    for (ey, eu, ev), (dy, du, dv) in zip(frames, out):
        assert np.array_equal(dy, ey)
        assert np.array_equal(du, eu)
        assert np.array_equal(dv, ev)


def test_randomized_gop_soak_self():
    """Bounded version of the development soak: random geometries
    (incl. 2x2 and crops), 8/10-bit, every knob combination — all
    frames must round-trip byte-exactly. (The 40-case libde265 soak
    ran 0-failure during development; the live crossval tests above
    keep the referee in the loop.)"""
    for trial in range(8):
        rng = np.random.default_rng(1000 + trial)
        bd = 10 if trial % 4 == 3 else 8
        dt = np.uint16 if bd == 10 else np.uint8
        mx = 1 << bd
        h = max(2, int(rng.integers(1, 6)) * 2
                + int(rng.integers(0, 3)) * 16)
        w = max(2, int(rng.integers(1, 6)) * 2
                + int(rng.integers(0, 3)) * 16)
        n_frames = int(rng.integers(2, 6))
        ch, cw = (h + 1) // 2, (w + 1) // 2
        frames = [(rng.integers(0, mx, (h, w)).astype(dt),
                   rng.integers(0, mx, (ch, cw)).astype(dt),
                   rng.integers(0, mx, (ch, cw)).astype(dt))]
        for _ in range(1, n_frames):
            py, pu, pv = frames[-1]
            r = int(rng.integers(0, 4))
            if r == 0:
                nxt = (py.copy(), pu.copy(), pv.copy())
            elif r == 1:
                sx = int(rng.integers(-3, 4)) * 2
                nxt = (np.roll(py, sx, axis=1),
                       np.roll(pu, sx // 2, axis=1),
                       np.roll(pv, sx // 2, axis=1))
            elif r == 2:
                y2 = py.copy()
                bh = min(int(rng.integers(4, 20)), h)
                bw = min(int(rng.integers(4, 20)), w)
                y2[:bh, :bw] = rng.integers(0, mx, (bh, bw))
                nxt = (y2, pu.copy(), pv.copy())
            else:
                nxt = (rng.integers(0, mx, (h, w)).astype(dt),
                       pu.copy(), pv.copy())
            frames.append(tuple(np.asarray(a, dt) for a in nxt))
        au = hevc_inter.encode_hevc_lossless_gop_yuv(
            frames, intra_every=int(rng.integers(0, 7)),
            frac_mv_every=int(rng.integers(0, 4)), bit_depth=bd)
        out = hevc_inter.decode_hevc_gop_yuv(au)
        for (ey, eu, ev), (dy, du, dv) in zip(frames, out):
            assert np.array_equal(dy, ey)
            assert np.array_equal(du, eu)
            assert np.array_equal(dv, ev)
