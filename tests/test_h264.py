"""H.264/AVC keyframe layer — kernels/h264 + container routes.

No H.264 validator of any kind exists on this host, so the module
deliberately ships only the structurally-safe slice (NAL/SPS/PPS/
slice-header parsing + I_PCM macroblocks, which are raw samples and
carry no entropy tables a round trip could fail to falsify); the
CAVLC/CABAC residual seam stays a NAMED NotImplementedError (see the
module docstring for the VP8-tables rationale). Pinning tiers:
1. bit-level codecs (exp-Golomb, EPB) against hand values;
2. byte-exact YUV round trips through real SPS/PPS/slice headers,
   multi-slice and AVCC/Annex-B conversions both ways;
3. container routes (mp4 avc1, Matroska V_MPEG4/ISO/AVC) through the
   same iter_video_frames/_decode_frame path the Spark stages use;
4. the malformed-input fuzz contract.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from ragflow_ocr_spark.kernels import h264
from ragflow_ocr_spark.ops import multimodal as mm


def _rng(seed: int = 0) -> np.random.Generator:
    return np.random.default_rng(seed)


def _flat_au(v: int, h: int = 32, w: int = 48) -> bytes:
    y = np.full((h, w), v, np.uint8)
    c = np.full((h // 2, w // 2), 128, np.uint8)
    return h264.encode_h264_ipcm_yuv(y, c, c)


# ------------------------------------------------------------- bit layer
def test_exp_golomb_hand_values_and_round_trip():
    # ue: 0->'1', 1->'010', 2->'011', 3->'00100' (T-REC-H.264 9.1):
    # concatenated = 1 010 011 00100 -> 1010 0110 0100 0000
    w2 = h264._BitWriter()
    w2.ue(0)
    w2.ue(1)
    w2.ue(2)
    w2.ue(3)
    w2.byte_align_zero()
    assert bytes(w2.out) == bytes([0b10100110, 0b01000000])
    r = h264._BitReader(bytes(w2.out))
    assert [r.ue() for _ in range(4)] == [0, 1, 2, 3]
    # se mapping: 0,1,-1,2,-2 <- codes 0,1,2,3,4 (9.1.1)
    w3 = h264._BitWriter()
    for v in (0, 1, -1, 2, -2, 17, -30):
        w3.se(v)
    w3.byte_align_zero()
    r3 = h264._BitReader(bytes(w3.out))
    assert [r3.se() for _ in range(7)] == [0, 1, -1, 2, -2, 17, -30]
    rnd = random.Random(1)
    vals = [rnd.randrange(0, 100000) for _ in range(200)]
    w4 = h264._BitWriter()
    for v in vals:
        w4.ue(v)
    w4.byte_align_zero()
    r4 = h264._BitReader(bytes(w4.out))
    assert [r4.ue() for _ in range(200)] == vals


def test_emulation_prevention_round_trip():
    rnd = random.Random(2)
    for _ in range(50):
        raw = bytes(rnd.choice((0, 0, 0, 1, 2, 3, 255))
                    for _ in range(rnd.randrange(0, 40)))
        ebsp = h264._add_epb(raw)
        assert b"\x00\x00\x00" not in ebsp
        assert b"\x00\x00\x01" not in ebsp
        assert h264._strip_epb(ebsp) == raw


# ------------------------------------------------------------ round trips
@pytest.mark.parametrize("shape", [(16, 16), (32, 48), (2, 2), (34, 50),
                                   (96, 130), (48, 64)])
def test_yuv_round_trip_byte_exact(shape):
    rng = _rng(shape[0])
    h, w = shape
    y = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    u = rng.integers(0, 256, size=((h + 1) // 2, (w + 1) // 2),
                     dtype=np.uint8)
    v = rng.integers(0, 256, size=((h + 1) // 2, (w + 1) // 2),
                     dtype=np.uint8)
    au = h264.encode_h264_ipcm_yuv(y, u, v)
    y2, u2, v2 = h264.decode_h264_keyframe_yuv(au)
    assert (y2 == y).all() and (u2 == u).all() and (v2 == v).all()


def test_sps_reports_cropped_dimensions():
    au = _flat_au(100, h=34, w=50)
    for t, _r, rbsp in h264.iter_nals_annexb(au):
        if t == 7:
            sps = h264.parse_sps(rbsp)
            assert (sps["width"], sps["height"]) == (50, 34)
            assert sps["profile"] == 66 and sps["chroma"] == 1
            break
    else:
        pytest.fail("no SPS NAL")


def test_rgb_round_trip_flat_and_gray():
    img = np.zeros((48, 64, 3), np.uint8)
    img[:] = (180, 90, 40)
    out = h264.decode_h264_keyframe(h264.encode_h264_ipcm(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    g = _rng(3).integers(0, 256, size=(32, 32), dtype=np.uint8)
    out = h264.decode_h264_keyframe(h264.encode_h264_ipcm(g))
    assert out.shape == g.shape
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 1


def test_avcc_conversion_both_ways():
    au = _flat_au(77)
    sample, sps, pps = h264.annexb_au_to_avcc(au)
    avcc = h264.build_avcc(sps, pps)
    nls, sps2, pps2 = h264.parse_avcc(avcc)
    assert nls == 4 and sps2 == sps and pps2 == pps
    back = h264.avcc_sample_to_annexb(sample, nls, sps + pps)
    y, _u, _v = h264.decode_h264_keyframe_yuv(back)
    assert (y == 77).all()


def test_multi_slice_frame_decodes():
    # hand-assemble a two-slice IDR frame: re-encode a frame, then
    # split its macroblocks across two slice NALs via first_mb_in_slice
    rng = _rng(4)
    y = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    c = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)

    def slice_nal(first_mb, mbs):
        bw = h264._BitWriter()
        bw.ue(first_mb)
        bw.ue(7)
        bw.ue(0)
        bw.u(0, 4)
        bw.ue(0)
        bw.u(0, 1)
        bw.u(0, 1)
        bw.se(0)
        for mb in mbs:
            my, mx = divmod(mb, 2)
            bw.ue(25)
            bw.byte_align_zero()
            bw.bytes_raw(y[my * 16:(my + 1) * 16,
                           mx * 16:(mx + 1) * 16].tobytes())
            bw.bytes_raw(c[my * 8:(my + 1) * 8,
                           mx * 8:(mx + 1) * 8].tobytes())
            bw.bytes_raw(c[my * 8:(my + 1) * 8,
                           mx * 8:(mx + 1) * 8].tobytes())
        return h264._nal(5, 3, bw.rbsp_trailing())

    au = b"".join(
        b"\x00\x00\x00\x01" + n
        for n in (h264._nal(7, 3, h264._sps_rbsp(32, 32)),
                  h264._nal(8, 3, h264._pps_rbsp()),
                  slice_nal(0, [0, 1]), slice_nal(2, [2, 3]))
    )
    y2, u2, v2 = h264.decode_h264_keyframe_yuv(au)
    assert (y2 == y).all() and (u2 == c).all() and (v2 == c).all()


# ------------------------------------------------------------- contracts
def test_entropy_coded_macroblock_is_named_seam():
    # hand-build an IDR slice whose first mb_type is 0 (I_4x4, CAVLC)
    bw = h264._BitWriter()
    bw.ue(0)
    bw.ue(7)
    bw.ue(0)
    bw.u(0, 4)
    bw.ue(0)
    bw.u(0, 1)
    bw.u(0, 1)
    bw.se(0)
    bw.ue(0)  # mb_type I_4x4
    bad = b"".join(
        b"\x00\x00\x00\x01" + n
        for n in (h264._nal(7, 3, h264._sps_rbsp(16, 16)),
                  h264._nal(8, 3, h264._pps_rbsp()),
                  h264._nal(5, 3, bw.rbsp_trailing()))
    )
    with pytest.raises(NotImplementedError, match="CAVLC"):
        h264.decode_h264_keyframe(bad)


def test_inter_slice_is_named_seam():
    bw = h264._BitWriter()
    bw.ue(0)
    bw.ue(5)  # P slice (all slices)
    nal = h264._nal(1, 2, bw.rbsp_trailing())
    bad = b"".join(
        b"\x00\x00\x00\x01" + n
        for n in (h264._nal(7, 3, h264._sps_rbsp(16, 16)),
                  h264._nal(8, 3, h264._pps_rbsp()), nal)
    )
    with pytest.raises(NotImplementedError, match="inter"):
        h264.decode_h264_keyframe(bad)


def test_truncation_and_mutation_never_crash():
    base = _flat_au(90)
    rnd = random.Random(5)
    for cut in range(4, len(base), max(1, len(base) // 50)):
        try:
            out = h264.decode_h264_keyframe(base[:cut])
            assert out.shape[:2] == (32, 48)
        except (ValueError, NotImplementedError):
            pass
    for _ in range(120):
        buf = bytearray(base)
        for _ in range(rnd.randint(1, 5)):
            buf[rnd.randrange(len(buf))] = rnd.randrange(256)
        try:
            out = h264.decode_h264_keyframe(bytes(buf))
            assert out.ndim in (2, 3)
        except (ValueError, NotImplementedError):
            pass


def test_garbage_rejected():
    for blob in (b"", b"\x00\x00\x01", b"garbage", b"\x00" * 64):
        with pytest.raises((ValueError, NotImplementedError)):
            h264.decode_h264_keyframe(blob)


def test_encoder_input_contract():
    with pytest.raises(ValueError):
        h264.encode_h264_ipcm(np.zeros((5, 5), np.uint8))  # odd dims
    with pytest.raises(ValueError):
        h264.encode_h264_ipcm(np.zeros((4, 4), np.float32))


# ------------------------------------------------------------ containers
def test_mp4_avc1_route():
    aus = [_flat_au(30 + 30 * k) for k in range(4)]
    mp4 = mm.encode_mp4_avc1(aus, 48, 32)
    frames = list(mm.iter_video_frames(mp4))
    assert len(frames) == 4
    for k, fr in enumerate(frames):
        y, _u, _v = h264.decode_h264_keyframe_yuv(fr)
        assert (y == 30 + 30 * k).all()
        img = mm._decode_frame(fr)
        assert img.shape[:2] == (32, 48)


def test_webm_avc_route():
    aus = [_flat_au(40 + 20 * k) for k in range(3)]
    samples, sps, pps = [], None, None
    for au in aus:
        s, sp, pp = h264.annexb_au_to_avcc(au)
        samples.append(s)
        sps, pps = sps or sp, pps or pp
    avcc = h264.build_avcc(sps, pps)
    # encode_webm writes no CodecPrivate, so assemble the TrackEntry
    # by hand with the avcC record in 0x63A2
    import struct as st

    track = mm._mkv_el(0xD7, b"\x01") + mm._mkv_el(0x83, b"\x01") \
        + mm._mkv_el(0x86, b"V_MPEG4/ISO/AVC") + mm._mkv_el(0x63A2, avcc)
    tracks = mm._mkv_el(0x1654AE6B, mm._mkv_el(0xAE, track))
    blocks = b""
    for k, s in enumerate(samples):
        blocks += mm._mkv_el(0xA3, b"\x81" + st.pack(">h", k) + b"\x80" + s)
    cluster = mm._mkv_el(0x1F43B675, mm._mkv_el(0xE7, b"\x00") + blocks)
    ebml = mm._mkv_el(0x1A45DFA3, mm._mkv_el(0x4282, b"matroska")
                      + mm._mkv_el(0x4286, b"\x01"))
    webm = ebml + mm._mkv_el(0x18538067, tracks + cluster)
    frames = list(mm.iter_video_frames(webm))
    assert len(frames) == 3
    for k, fr in enumerate(frames):
        y, _u, _v = h264.decode_h264_keyframe_yuv(fr)
        assert (y == 40 + 20 * k).all()


def test_mp4_entropy_coded_track_is_per_row_error(spark):
    """A real-CAVLC avc1 mp4 must become an error row in the Spark
    frame stage, never a task failure."""
    # fabricate an avc1 sample whose slice uses mb_type 0 (CAVLC)
    bw = h264._BitWriter()
    bw.ue(0)
    bw.ue(7)
    bw.ue(0)
    bw.u(0, 4)
    bw.ue(0)
    bw.u(0, 1)
    bw.u(0, 1)
    bw.se(0)
    bw.ue(0)
    nal = h264._nal(5, 3, bw.rbsp_trailing())
    au = b"".join(
        b"\x00\x00\x00\x01" + n
        for n in (h264._nal(7, 3, h264._sps_rbsp(16, 16)),
                  h264._nal(8, 3, h264._pps_rbsp()), nal)
    )
    mp4 = mm.encode_mp4_avc1([au], 16, 16)
    df = spark.createDataFrame(
        [(1, "video", bytearray(mp4), "avc1", 16, 16, 0)],
        mm.MEDIA_SCHEMA,
    )
    out = df.mapInPandas(
        mm.frame_sample_stage(every_k=1), schema=mm.FRAME_SAMPLE_SCHEMA
    ).toPandas()
    assert len(out) == 1 and out.status[0] == "error"


def _ipcm_slice_rbsp(y, c, mbs, w_mbs, idr=True, marking=True):
    bw = h264._BitWriter()
    bw.ue(mbs[0])
    bw.ue(7)
    bw.ue(0)
    bw.u(0, 4)
    if idr:
        bw.ue(0)             # idr_pic_id
    if marking:
        if idr:
            bw.u(0, 1)       # no_output_of_prior_pics
            bw.u(0, 1)       # long_term_reference
        else:
            bw.u(0, 1)       # adaptive_ref_pic_marking_mode_flag
    bw.se(0)
    for mb in mbs:
        my, mx = divmod(mb, w_mbs)
        bw.ue(25)
        bw.byte_align_zero()
        bw.bytes_raw(y[my * 16:(my + 1) * 16,
                       mx * 16:(mx + 1) * 16].tobytes())
        bw.bytes_raw(c[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8]
                     .tobytes())
        bw.bytes_raw(c[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8]
                     .tobytes())
    return bw.rbsp_trailing()


def _au(*nals):
    return b"".join(b"\x00\x00\x00\x01" + n for n in nals)


def test_non_reference_i_slice_has_no_marking_bits():
    # §7.3.3: dec_ref_pic_marking is present only when nal_ref_idc!=0;
    # a non-reference I slice (nal 1, ref_idc 0) must parse without it
    rng = _rng(11)
    y = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    c = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    rbsp = _ipcm_slice_rbsp(y, c, [0, 1, 2, 3], 2, idr=False,
                            marking=False)
    au = _au(h264._nal(7, 3, h264._sps_rbsp(32, 32)),
             h264._nal(8, 3, h264._pps_rbsp()),
             h264._nal(1, 0, rbsp))
    y2, u2, v2 = h264.decode_h264_keyframe_yuv(au)
    assert (y2 == y).all() and (u2 == c).all() and (v2 == c).all()
    # an IDR with ref_idc 0 is forbidden (§7.4.1) — loud error
    rbsp5 = _ipcm_slice_rbsp(y, c, [0, 1, 2, 3], 2)
    with pytest.raises(ValueError):
        h264.decode_h264_keyframe_yuv(
            _au(h264._nal(7, 3, h264._sps_rbsp(32, 32)),
                h264._nal(8, 3, h264._pps_rbsp()),
                h264._nal(5, 0, rbsp5)))


def test_overlapping_and_gappy_slices_are_loud():
    rng = _rng(12)
    y = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    c = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    sps = h264._nal(7, 3, h264._sps_rbsp(32, 32))
    pps = h264._nal(8, 3, h264._pps_rbsp())
    full = h264._nal(5, 3, _ipcm_slice_rbsp(y, c, [0, 1, 2, 3], 2))
    half = h264._nal(5, 3, _ipcm_slice_rbsp(y, c, [0, 1], 2))
    # two full slices: every MB decoded twice — overlap, not "covered"
    with pytest.raises(ValueError, match="overlap"):
        h264.decode_h264_keyframe_yuv(_au(sps, pps, full, full))
    # two copies of the first half: 4 MBs decoded but 2 never covered
    with pytest.raises(ValueError):
        h264.decode_h264_keyframe_yuv(_au(sps, pps, half, half))
    # a lone half slice: plain gap
    with pytest.raises(ValueError, match="cover"):
        h264.decode_h264_keyframe_yuv(_au(sps, pps, half))


def test_parse_avcc_truncations_are_valueerror():
    # build a valid avcC then cut it at every byte
    sps_nal = h264._nal(7, 3, h264._sps_rbsp(48, 32))
    pps_nal = h264._nal(8, 3, h264._pps_rbsp())
    cfg = bytes([1, sps_nal[1], sps_nal[2], sps_nal[3], 0xFF, 0xE1])
    cfg += len(sps_nal).to_bytes(2, "big") + sps_nal
    cfg += bytes([1]) + len(pps_nal).to_bytes(2, "big") + pps_nal
    h264.parse_avcc(cfg)  # sanity: the intact record parses
    for cut in range(len(cfg)):
        try:
            h264.parse_avcc(cfg[:cut])
        except ValueError:
            pass   # struct.error / silent truncation would fail here
    # declared SPS length overrunning the buffer is loud, not silent
    bad = bytearray(cfg)
    bad[6:8] = (len(cfg)).to_bytes(2, "big")
    with pytest.raises(ValueError, match="truncated"):
        h264.parse_avcc(bytes(bad))
