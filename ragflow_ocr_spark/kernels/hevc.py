"""H.265/HEVC (ITU-T H.265 / ISO/IEC 23008-2) keyframe layer.

Reference parity target: the reference hands any payload to
cv2/ffmpeg (``/root/reference/ocr/operators.py:41-46``); hvc1 (HEVC)
is the second-most-common crawl mp4 video codec after avc1. This
module implements the structurally-safe slice of the format from
scratch, the same contract as the H.264 sibling (kernels/h264.py):

- NAL unit layer: Annex-B start-code streams AND HVCC length-prefixed
  samples (hvcC decoder-configuration parsing), with the 2-byte HEVC
  NAL header and the same emulation-prevention escaping as H.264;
- VPS/SPS/PPS write + parse (profile_tier_level, picture geometry,
  conformance window, CTB/CB sizes, PCM parameters) — SPS parsing
  alone gives every hvc1 track its true dimensions;
- a REAL CABAC arithmetic engine (encode + decode): unlike H.264
  I_PCM (plain Exp-Golomb in CAVLC mode), HEVC slice data is CABAC
  even on the PCM path — split_cu_flag is a context-coded bin and
  pcm_flag / end_of_slice_segment_flag are terminate bins, so the
  9-bit range coder of spec clause 9.3 is required in full;
- pcm_flag=1 coding units (raw uncompressed CTBs): byte-exact YUV
  round trips — any conformant decoder reconstructs our streams
  exactly, and the system libde265 on this host verifies exactly
  that (tests/test_hevc_libde265_crossval.py).

PROVENANCE of the three normative constant tables (the VP8-tables
lesson: never ship memory-reconstructed entropy tables without an
independent check):

- ``RANGE_TAB_LPS`` (spec Table 9-46, 64x4) and ``TRANS_IDX_LPS``
  (Table 9-47, 64) are transcribed from the SYSTEM libde265 binary
  (/lib/x86_64-linux-gnu/libde265.so.0: the unique 256-byte block at
  0x584e0 and the unique 64-byte block at 0x58440) — the same
  extraction tier as the QM-coder table pinned against libjpeg's
  exported ``jpeg_aritab``; both match their H.264 counterparts
  (H.264 Tables 9-44/9-45 — HEVC reuses that engine) and are pinned
  against the .so bytes in tests when the library is present.
- ``split_cu_flag`` initValues {139, 141, 157} (I/P/B ctx0) appear
  verbatim in libde265's context-init data (u32 table at 0x590c0:
  139,141,157 / 107,139,126 / 107,139,126), matching spec Table 9-19.

ENTROPY-CODED CONTENT now decodes for real: streams beyond the pure-
PCM shape (i.e. every x265/camera still) route to the full Main-
profile INTRA decoder in kernels/hevc_intra.py — CABAC coding
quadtree, all 35 intra modes, residual coding, DST/DCT inverse
transforms, deblocking, SAO, WPP substreams — validated sample-exact
against the system libde265 on real x265 encodes
(tests/test_hevc_intra.py), for 8-bit AND Main10 streams; low-delay
P pictures (merge/skip, AMVP motion vectors, quarter-pel 8-tap /
eighth-pel 4-tap motion compensation, inter residual, MV-derived
deblocking strengths) decode via kernels/hevc_inter with the same
libde265 falsification (tests/test_hevc_inter.py). Remaining named
seams: B slices, multi-reference/TMVP, non-2Nx2N inter partitions,
tiles, scaling lists, >10-bit / non-4:2:0.

Error contract: ValueError on malformed input, NotImplementedError on
the named seam — the Spark media stages map both to per-row error
statuses (never a task failure).
"""

from __future__ import annotations

import struct

import numpy as np

from ragflow_ocr_spark.kernels.h264 import (
    MAX_H264_PIXELS,
    _add_epb,
    _BitReader,
    _BitWriter,
    _rgb_to_yuv,
    _strip_epb,
    _yuv_to_rgb,
)

MAX_HEVC_PIXELS = MAX_H264_PIXELS  # same still-frame budget

# NAL unit types (spec Table 7-1)
NAL_IDR_W_RADL = 19
NAL_IDR_N_LP = 20
NAL_CRA = 21
NAL_VPS = 32
NAL_SPS = 33
NAL_PPS = 34
NAL_AUD = 35
NAL_SEI_PREFIX = 39
NAL_SEI_SUFFIX = 40
_IRAP_TYPES = frozenset(range(16, 24))

# fixed coded geometry for the encoder: CTB 32x32 (log2 5), min CB
# 16 (log2 4) so split_cu_flag IS signalled at CTB level (we send 0)
# while part_mode is NOT (CU size != MinCbSizeY) — the minimal
# context-coded surface; PCM CU size pinned to 32 (min == max)
_CTB_LOG2 = 5
_MIN_CB_LOG2 = 4
_CTB = 1 << _CTB_LOG2

# ------------------------------------------------- CABAC constant tables
# Table 9-46 rangeTabLps[pStateIdx][qRangeIdx] — extracted from the
# system libde265 (see module doc); identical to H.264 Table 9-44.
RANGE_TAB_LPS = (
    (128, 176, 208, 240), (128, 167, 197, 227), (128, 158, 187, 216),
    (123, 150, 178, 205), (116, 142, 169, 195), (111, 135, 160, 185),
    (105, 128, 152, 175), (100, 122, 144, 166), (95, 116, 137, 158),
    (90, 110, 130, 150), (85, 104, 123, 142), (81, 99, 117, 135),
    (77, 94, 111, 128), (73, 89, 105, 122), (69, 85, 100, 116),
    (66, 80, 95, 110), (62, 76, 90, 104), (59, 72, 86, 99),
    (56, 69, 81, 94), (53, 65, 77, 89), (51, 62, 73, 85),
    (48, 59, 69, 80), (46, 56, 66, 76), (43, 53, 63, 72),
    (41, 50, 59, 69), (39, 48, 56, 65), (37, 45, 54, 62),
    (35, 43, 51, 59), (33, 41, 48, 56), (32, 39, 46, 53),
    (30, 37, 43, 50), (29, 35, 41, 48), (27, 33, 39, 45),
    (26, 31, 37, 43), (24, 30, 35, 41), (23, 28, 33, 39),
    (22, 27, 32, 37), (21, 26, 30, 35), (20, 24, 29, 33),
    (19, 23, 27, 31), (18, 22, 26, 30), (17, 21, 25, 28),
    (16, 20, 23, 27), (15, 19, 22, 25), (14, 18, 21, 24),
    (14, 17, 20, 23), (13, 16, 19, 22), (12, 15, 18, 21),
    (12, 14, 17, 20), (11, 14, 16, 19), (11, 13, 15, 18),
    (10, 12, 15, 17), (10, 12, 14, 16), (9, 11, 13, 15),
    (9, 11, 12, 14), (8, 10, 12, 14), (8, 9, 11, 13),
    (7, 9, 11, 12), (7, 9, 10, 12), (7, 8, 10, 11),
    (6, 8, 9, 11), (6, 7, 9, 10), (6, 7, 8, 9),
    (2, 2, 2, 2),
)
# Table 9-47 transIdxLps — extracted from the system libde265.
TRANS_IDX_LPS = (
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63,
)

# split_cu_flag initValue, I-slice (initType 0) ctx 0 — Table 9-19;
# our geometry keeps every CTB at cqtDepth 0 so ctxInc is always 0.
_SPLIT_CU_INIT_I = 139


def _ctx_init(init_value: int, qp: int) -> list[int]:
    """Spec 9.3.2.2: initValue + SliceQpY -> [pStateIdx, valMps]."""
    slope = (init_value >> 4) * 5 - 45
    offset = ((init_value & 15) << 3) - 16
    pre = min(max(1, ((slope * min(max(qp, 0), 51)) >> 4) + offset), 126)
    if pre <= 63:
        return [63 - pre, 0]
    return [pre - 64, 1]


# --------------------------------------------------------- CABAC engine
class _CabacEncoder:
    """Spec 9.3.4.4 arithmetic encoder over a _BitWriter (the classic
    9-bit-range engine with outstanding-bit carry resolution)."""

    __slots__ = ("bw", "low", "range", "outstanding", "first")

    def __init__(self, bw: _BitWriter) -> None:
        self.bw = bw
        self.init_engine()

    def init_engine(self) -> None:
        self.low = 0
        self.range = 510
        self.outstanding = 0
        self.first = True  # the first PutBit of each engine run is
        # discarded (spec firstBitFlag): range 510 < 512 makes it
        # carry no information, and the decoder's 9-bit preload
        # accounts for exactly this offset

    def _put_bit(self, b: int) -> None:
        if self.first:
            self.first = False
        else:
            self.bw.u(b, 1)
        while self.outstanding:
            self.bw.u(1 - b, 1)
            self.outstanding -= 1

    def _renorm(self) -> None:
        while self.range < 256:
            if self.low >= 512:
                self.low -= 512
                self._put_bit(1)
            elif self.low < 256:
                self._put_bit(0)
            else:
                self.low -= 256
                self.outstanding += 1
            self.range <<= 1
            self.low <<= 1

    def encode_decision(self, ctx: list[int], bin_val: int) -> None:
        lps = RANGE_TAB_LPS[ctx[0]][(self.range >> 6) & 3]
        self.range -= lps
        if bin_val != ctx[1]:
            self.low += self.range
            self.range = lps
            if ctx[0] == 0:
                ctx[1] ^= 1
            ctx[0] = TRANS_IDX_LPS[ctx[0]]
        else:
            ctx[0] = min(ctx[0] + 1, 62)
        self._renorm()

    def encode_bypass(self, bin_val: int) -> None:
        """Spec 9.3.4.4.4 EncodeBypass (EP bins)."""
        self.low <<= 1
        if bin_val:
            self.low += self.range
        if self.low >= 1024:
            self._put_bit(1)
            self.low -= 1024
        elif self.low < 512:
            self._put_bit(0)
        else:
            self.outstanding += 1
            self.low -= 512

    def encode_bypass_bits(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.encode_bypass((val >> i) & 1)

    def encode_terminate(self, bin_val: int) -> None:
        """Terminate bin; bin_val=1 MUST be followed by flush()."""
        self.range -= 2
        if bin_val:
            self.low += self.range
        else:
            self._renorm()

    def flush(self) -> None:
        """Spec 9.3.4.4.6 EncodeFlush: leaves the _BitWriter at the
        exact bit position the decoder's read pointer reaches after
        consuming the terminate=1 bin (so PCM byte-alignment lines
        up on both sides)."""
        self.range = 2
        self._renorm()
        self._put_bit((self.low >> 9) & 1)
        self.bw.u(((self.low >> 7) & 3) | 1, 2)


class _CabacDecoder:
    """Spec 9.3.4.3 arithmetic decoder over a _BitReader."""

    __slots__ = ("r", "range", "offset")

    def __init__(self, r: _BitReader) -> None:
        self.r = r
        self.init_engine()

    def init_engine(self) -> None:
        self.range = 510
        self.offset = self.r.u(9)

    def decode_decision(self, ctx: list[int]) -> int:
        lps = RANGE_TAB_LPS[ctx[0]][(self.range >> 6) & 3]
        self.range -= lps
        if self.offset >= self.range:
            bin_val = 1 - ctx[1]
            self.offset -= self.range
            self.range = lps
            if ctx[0] == 0:
                ctx[1] ^= 1
            ctx[0] = TRANS_IDX_LPS[ctx[0]]
        else:
            bin_val = ctx[1]
            ctx[0] = min(ctx[0] + 1, 62)
        rng = self.range
        if rng < 256:
            # renormalization with the single-bit reads inlined —
            # decode_decision is the engine's hottest path
            r = self.r
            p, n, d, off = r.pos, r.n, r.data, self.offset
            while rng < 256:
                if p >= n:
                    raise ValueError("truncated H.264 RBSP")
                off = (off << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
                p += 1
                rng <<= 1
            r.pos = p
            self.range = rng
            self.offset = off
        return bin_val

    def decode_bypass(self) -> int:
        """Spec 9.3.4.3.4 DecodeBypass (EP bins)."""
        r = self.r
        p = r.pos
        if p >= r.n:
            raise ValueError("truncated H.264 RBSP")
        r.pos = p + 1
        self.offset = (self.offset << 1) | (
            (r.data[p >> 3] >> (7 - (p & 7))) & 1)
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def decode_bypass_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.decode_bypass()
        return v

    def decode_terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1  # no renormalization; engine re-inits next
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self.r.u(1)
        return 0


# ----------------------------------------------------------------- NAL
def _nal_hdr(nal_type: int) -> bytes:
    # forbidden(1)=0 | type(6) | layer_id(6)=0 | temporal_id_plus1(3)=1
    return bytes([(nal_type << 1) & 0x7E, 1])


def _nal(nal_type: int, rbsp: bytes) -> bytes:
    return _nal_hdr(nal_type) + _add_epb(rbsp)


def iter_nals_annexb(data: bytes):
    """Yield (nal_type, rbsp) from an HEVC Annex-B stream."""
    n = len(data)
    i = data.find(b"\x00\x00\x01")
    if i < 0:
        raise ValueError("no Annex-B start code")
    while i >= 0:
        start = i + 3
        j = data.find(b"\x00\x00\x01", start)
        end = n if j < 0 else j
        while end > start and data[end - 1] == 0:
            end -= 1
        if end > start + 1:
            h0, h1 = data[start], data[start + 1]
            if h0 & 0x80:
                raise ValueError("forbidden_zero_bit set in NAL header")
            if (h0 & 1) or (h1 >> 3):
                raise NotImplementedError(
                    "HEVC layered (nuh_layer_id>0) streams not bundled")
            yield (h0 >> 1) & 0x3F, _strip_epb(data[start + 2:end])
        i = j


def _strip_epb_pos(data: bytes):
    """EBSP -> (RBSP, drop positions). Each drop position q means the
    raw stream carried an emulation_prevention_three_byte after RBSP
    byte q-1 (drop j sits at raw index q+j). Needed to convert WPP
    entry-point offsets (spec 7.4.7.1: counted in the EPB-inclusive
    NAL payload) into RBSP substream boundaries."""
    if b"\x00\x00\x03" not in data:
        return data, ()
    out = bytearray()
    pos = []
    i, n = 0, len(data)
    while i < n:
        if i + 2 < n and data[i] == 0 and data[i + 1] == 0 \
                and data[i + 2] == 3:
            out += b"\x00\x00"
            pos.append(len(out))
            i += 3
        else:
            out.append(data[i])
            i += 1
    return bytes(out), tuple(pos)


def _iter_nals_annexb_epb(data: bytes):
    """Like iter_nals_annexb but yields (nal_type, rbsp, epb_pos)."""
    n = len(data)
    i = data.find(b"\x00\x00\x01")
    if i < 0:
        raise ValueError("no Annex-B start code")
    while i >= 0:
        start = i + 3
        j = data.find(b"\x00\x00\x01", start)
        end = n if j < 0 else j
        while end > start and data[end - 1] == 0:
            end -= 1
        if end > start + 1:
            h0, h1 = data[start], data[start + 1]
            if h0 & 0x80:
                raise ValueError("forbidden_zero_bit set in NAL header")
            if (h0 & 1) or (h1 >> 3):
                raise NotImplementedError(
                    "HEVC layered (nuh_layer_id>0) streams not bundled")
            rbsp, pos = _strip_epb_pos(data[start + 2:end])
            yield (h0 >> 1) & 0x3F, rbsp, pos
        i = j


def sniff_annexb_hevc(data: bytes) -> bool:
    """Cheap probe: Annex-B stream whose first NAL is VPS/SPS/PPS/
    IRAP/AUD with a plausible HEVC header second byte."""
    for pre in (b"\x00\x00\x00\x01", b"\x00\x00\x01"):
        if data.startswith(pre) and len(data) > len(pre) + 1:
            h0, h1 = data[len(pre)], data[len(pre) + 1]
            t = (h0 >> 1) & 0x3F
            return (
                not (h0 & 0x81)
                and (h1 & 0xF8) == 0
                and (h1 & 7) >= 1
                and (t in (NAL_VPS, NAL_SPS, NAL_PPS, NAL_AUD)
                     or t in _IRAP_TYPES)
            )
    return False


def split_annexb(data: bytes) -> list[bytes]:
    """Annex-B stream -> raw NAL units (2-byte header + EBSP)."""
    out = []
    n = len(data)
    i = data.find(b"\x00\x00\x01")
    if i < 0:
        raise ValueError("no Annex-B start code")
    while i >= 0:
        start = i + 3
        j = data.find(b"\x00\x00\x01", start)
        end = n if j < 0 else j
        while end > start and data[end - 1] == 0:
            end -= 1
        if end > start:
            out.append(data[start:end])
        i = j
    return out


# ------------------------------------------------------- parameter sets
def _parse_ptl(r: _BitReader, max_sub_layers_minus1: int) -> dict:
    """profile_tier_level(1, maxNumSubLayersMinus1)."""
    r.u(2)  # general_profile_space
    r.u(1)  # general_tier_flag
    profile_idc = r.u(5)
    r.u(32)  # compatibility flags
    r.u(4)   # progressive/interlaced/non_packed/frame_only
    r.u(44)  # general_reserved_zero_44bits (v1 layout)
    level_idc = r.u(8)
    sub_profile = []
    sub_level = []
    for _ in range(max_sub_layers_minus1):
        sub_profile.append(r.u(1))
        sub_level.append(r.u(1))
    if max_sub_layers_minus1 > 0:
        for _ in range(8 - max_sub_layers_minus1):
            r.u(2)  # reserved_zero_2bits
    for i in range(max_sub_layers_minus1):
        if sub_profile[i]:
            r.u(2 + 1 + 5 + 32 + 4)
            r.u(44)
        if sub_level[i]:
            r.u(8)
    return {"profile_idc": profile_idc, "level_idc": level_idc}


def _write_ptl(bw: _BitWriter) -> None:
    bw.u(0, 2)            # profile_space
    bw.u(0, 1)            # tier: Main
    bw.u(1, 5)            # profile_idc: Main
    bw.u(1 << 30, 32)     # compatibility: profile 1
    bw.u(0b1011, 4)       # progressive=1, interlaced=0, non_packed=1,
    #                       frame_only=1
    bw.u(0, 44)           # reserved
    bw.u(153, 8)          # level 5.1 (covers the pixel budget)


def parse_sps(rbsp: bytes) -> dict:
    """SPS fields the keyframe layer needs (dimensions always parse,
    even for streams whose slice data is beyond the PCM path)."""
    r = _BitReader(rbsp)
    r.u(4)  # sps_video_parameter_set_id
    max_sub = r.u(3)
    r.u(1)  # sps_temporal_id_nesting_flag
    _parse_ptl(r, max_sub)
    r.ue()  # sps_seq_parameter_set_id
    chroma = r.ue()
    if chroma == 3:
        r.u(1)  # separate_colour_plane_flag
    w = r.ue()
    h = r.ue()
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # conformance_window_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    bit_depth = r.ue() + 8
    bit_depth_c = r.ue() + 8
    log2_max_poc = r.ue() + 4
    sub_ordering = r.u(1)
    for _ in range((max_sub + 1) if sub_ordering else 1):
        r.ue(), r.ue(), r.ue()
    min_cb_log2 = r.ue() + 3
    ctb_log2 = min_cb_log2 + r.ue()
    min_tb_log2 = r.ue() + 2
    max_tb_log2 = min_tb_log2 + r.ue()
    hier_inter = r.ue()
    hier_intra = r.ue()
    if r.u(1):  # scaling_list_enabled_flag
        raise NotImplementedError(
            "HEVC scaling lists not bundled (entropy seam)")
    amp = r.u(1)
    sao = r.u(1)
    pcm = {}
    if r.u(1):  # pcm_enabled_flag
        pcm = {
            "bit_depth": r.u(4) + 1,
            "bit_depth_c": r.u(4) + 1,
            "log2_min": r.ue() + 3,
        }
        pcm["log2_max"] = pcm["log2_min"] + r.ue()
        pcm["loop_filter_disabled"] = r.u(1)
    n_st_rps = r.ue()
    if n_st_rps:
        raise NotImplementedError(
            "HEVC reference-picture sets not bundled (keyframe layer)")
    if r.u(1):  # long_term_ref_pics_present_flag
        raise NotImplementedError(
            "HEVC long-term references not bundled (keyframe layer)")
    tmvp = r.u(1)  # sps_temporal_mvp_enabled_flag
    strong_smoothing = r.u(1)
    # VUI and extensions are ignorable for the keyframe layer
    if chroma == 1:
        sub_w = sub_h = 2
    elif chroma == 2:
        sub_w, sub_h = 2, 1
    elif chroma == 0:
        sub_w = sub_h = 1
    else:
        sub_w = sub_h = 1
    width = w - sub_w * (crop_l + crop_r)
    height = h - sub_h * (crop_t + crop_b)
    if width <= 0 or height <= 0 or w * h > MAX_HEVC_PIXELS:
        raise ValueError("HEVC SPS geometry out of budget")
    return {
        "chroma": chroma, "bit_depth": bit_depth,
        "bit_depth_c": bit_depth_c, "pic_w": w, "pic_h": h,
        "width": width, "height": height,
        "crop": (crop_l, crop_r, crop_t, crop_b),
        "min_cb_log2": min_cb_log2, "ctb_log2": ctb_log2,
        "min_tb_log2": min_tb_log2, "max_tb_log2": max_tb_log2,
        "hier_inter": hier_inter, "hier_intra": hier_intra,
        "strong_smoothing": strong_smoothing, "tmvp": tmvp,
        "amp": amp, "sao": sao, "pcm": pcm,
        "log2_max_poc": log2_max_poc,
    }


def parse_pps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    r.ue()  # pps_pic_parameter_set_id
    r.ue()  # pps_seq_parameter_set_id
    dependent = r.u(1)
    output_flag_present = r.u(1)
    extra_bits = r.u(3)
    sign_data_hiding = r.u(1)
    cabac_init_present = r.u(1)
    r.ue(), r.ue()  # num_ref_idx defaults
    init_qp = 26 + r.se()
    r.u(1)  # constrained_intra_pred_flag (no effect in I slices)
    transform_skip = r.u(1)
    cu_qp_delta = r.u(1)
    cu_qp_delta_depth = r.ue() if cu_qp_delta else 0
    cb_qp_offset = r.se()
    cr_qp_offset = r.se()
    slice_chroma_qp = r.u(1)
    r.u(1), r.u(1)  # weighted pred flags
    transquant_bypass = r.u(1)
    tiles = r.u(1)
    entropy_sync = r.u(1)
    if tiles:
        raise NotImplementedError("HEVC tiles not bundled")
    loop_filter_across = r.u(1)
    deblocking_control = r.u(1)
    deblocking_override = deblocking_disabled = 0
    beta_offset = tc_offset = 0
    if deblocking_control:
        deblocking_override = r.u(1)
        deblocking_disabled = r.u(1)
        if not deblocking_disabled:
            beta_offset = r.se() * 2
            tc_offset = r.se() * 2
    if r.u(1):  # pps_scaling_list_data_present_flag
        raise NotImplementedError(
            "HEVC scaling lists not bundled (entropy seam)")
    r.u(1)  # lists_modification_present_flag
    r.ue()  # log2_parallel_merge_level_minus2
    hdr_ext = r.u(1)
    return {
        "dependent": dependent, "output_flag_present": output_flag_present,
        "extra_bits": extra_bits, "cabac_init_present": cabac_init_present,
        "init_qp": init_qp, "cu_qp_delta": cu_qp_delta,
        "cu_qp_delta_depth": cu_qp_delta_depth,
        "sign_data_hiding": sign_data_hiding,
        "transform_skip": transform_skip,
        "cb_qp_offset": cb_qp_offset, "cr_qp_offset": cr_qp_offset,
        "slice_chroma_qp": slice_chroma_qp,
        "transquant_bypass": transquant_bypass,
        "entropy_sync": entropy_sync,
        "loop_filter_across": loop_filter_across,
        "deblocking_override": deblocking_override,
        "deblocking_disabled": deblocking_disabled,
        "beta_offset": beta_offset, "tc_offset": tc_offset,
        "hdr_ext": hdr_ext,
    }


def _vps_rbsp() -> bytes:
    bw = _BitWriter()
    bw.u(0, 4)        # vps_video_parameter_set_id
    bw.u(3, 2)        # vps_reserved_three_2bits
    bw.u(0, 6)        # vps_max_layers_minus1
    bw.u(0, 3)        # vps_max_sub_layers_minus1
    bw.u(1, 1)        # vps_temporal_id_nesting_flag
    bw.u(0xFFFF, 16)  # vps_reserved_0xffff_16bits
    _write_ptl(bw)
    bw.u(0, 1)        # vps_sub_layer_ordering_info_present_flag
    bw.ue(0)          # vps_max_dec_pic_buffering_minus1
    bw.ue(0)          # vps_max_num_reorder_pics
    bw.ue(0)          # vps_max_latency_increase_plus1
    bw.u(0, 6)        # vps_max_layer_id
    bw.ue(0)          # vps_num_layer_sets_minus1
    bw.u(0, 1)        # vps_timing_info_present_flag
    bw.u(0, 1)        # vps_extension_flag
    return bw.rbsp_trailing()


def _sps_rbsp(pic_w: int, pic_h: int, crop_r: int, crop_b: int) -> bytes:
    bw = _BitWriter()
    bw.u(0, 4)  # sps_video_parameter_set_id
    bw.u(0, 3)  # sps_max_sub_layers_minus1
    bw.u(1, 1)  # sps_temporal_id_nesting_flag
    _write_ptl(bw)
    bw.ue(0)    # sps_seq_parameter_set_id
    bw.ue(1)    # chroma_format_idc: 4:2:0
    bw.ue(pic_w)
    bw.ue(pic_h)
    if crop_r or crop_b:
        bw.u(1, 1)
        bw.ue(0), bw.ue(crop_r // 2), bw.ue(0), bw.ue(crop_b // 2)
    else:
        bw.u(0, 1)
    bw.ue(0)    # bit_depth_luma_minus8
    bw.ue(0)    # bit_depth_chroma_minus8
    bw.ue(0)    # log2_max_pic_order_cnt_lsb_minus4
    bw.u(0, 1)  # sps_sub_layer_ordering_info_present_flag
    bw.ue(0), bw.ue(0), bw.ue(0)  # dec buffering / reorder / latency
    bw.ue(_MIN_CB_LOG2 - 3)             # log2_min_luma_cb_size_minus3
    bw.ue(_CTB_LOG2 - _MIN_CB_LOG2)     # log2_diff_max_min_luma_cb
    bw.ue(0)    # log2_min_luma_transform_block_size_minus2 (4)
    bw.ue(3)    # log2_diff_max_min_luma_transform_block_size (32)
    bw.ue(0)    # max_transform_hierarchy_depth_inter
    bw.ue(0)    # max_transform_hierarchy_depth_intra
    bw.u(0, 1)  # scaling_list_enabled_flag
    bw.u(0, 1)  # amp_enabled_flag
    bw.u(0, 1)  # sample_adaptive_offset_enabled_flag
    bw.u(1, 1)  # pcm_enabled_flag
    bw.u(7, 4)  # pcm_sample_bit_depth_luma_minus1
    bw.u(7, 4)  # pcm_sample_bit_depth_chroma_minus1
    bw.ue(_CTB_LOG2 - 3)  # log2_min_pcm_luma_cb_size_minus3 (32)
    bw.ue(0)              # log2_diff_max_min_pcm_luma_cb_size
    bw.u(1, 1)  # pcm_loop_filter_disabled_flag
    bw.ue(0)    # num_short_term_ref_pic_sets
    bw.u(0, 1)  # long_term_ref_pics_present_flag
    bw.u(0, 1)  # sps_temporal_mvp_enabled_flag
    bw.u(0, 1)  # strong_intra_smoothing_enabled_flag
    bw.u(0, 1)  # vui_parameters_present_flag
    bw.u(0, 1)  # sps_extension_flag
    return bw.rbsp_trailing()


def _pps_rbsp() -> bytes:
    bw = _BitWriter()
    bw.ue(0)    # pps_pic_parameter_set_id
    bw.ue(0)    # pps_seq_parameter_set_id
    bw.u(0, 1)  # dependent_slice_segments_enabled_flag
    bw.u(0, 1)  # output_flag_present_flag
    bw.u(0, 3)  # num_extra_slice_header_bits
    bw.u(0, 1)  # sign_data_hiding_enabled_flag
    bw.u(0, 1)  # cabac_init_present_flag
    bw.ue(0), bw.ue(0)  # num_ref_idx defaults
    bw.se(0)    # init_qp_minus26 (QP 26)
    bw.u(0, 1)  # constrained_intra_pred_flag
    bw.u(0, 1)  # transform_skip_enabled_flag
    bw.u(0, 1)  # cu_qp_delta_enabled_flag
    bw.se(0), bw.se(0)  # pps cb/cr qp offsets
    bw.u(0, 1)  # pps_slice_chroma_qp_offsets_present_flag
    bw.u(0, 1), bw.u(0, 1)  # weighted pred flags
    bw.u(0, 1)  # transquant_bypass_enabled_flag
    bw.u(0, 1)  # tiles_enabled_flag
    bw.u(0, 1)  # entropy_coding_sync_enabled_flag
    bw.u(0, 1)  # pps_loop_filter_across_slices_enabled_flag
    bw.u(1, 1)  # deblocking_filter_control_present_flag
    bw.u(0, 1)  # deblocking_filter_override_enabled_flag
    bw.u(1, 1)  # pps_deblocking_filter_disabled_flag
    bw.u(0, 1)  # pps_scaling_list_data_present_flag
    bw.u(0, 1)  # lists_modification_present_flag
    bw.ue(0)    # log2_parallel_merge_level_minus2
    bw.u(0, 1)  # slice_segment_header_extension_present_flag
    bw.u(0, 1)  # pps_extension_flag
    return bw.rbsp_trailing()


# ---------------------------------------------------------------- decode
def _parse_slice_header(r: _BitReader, nal_type: int, sps: dict,
                        pps: dict) -> dict:
    first = r.u(1)
    if nal_type in _IRAP_TYPES:
        r.u(1)  # no_output_of_prior_pics_flag
    r.ue()  # slice_pic_parameter_set_id
    addr = 0
    dependent = 0
    if not first:
        if pps["dependent"]:
            dependent = r.u(1)
        ctb = 1 << sps["ctb_log2"]
        n_ctbs = ((sps["pic_w"] + ctb - 1) // ctb) * (
            (sps["pic_h"] + ctb - 1) // ctb)
        addr = r.u(max(1, (n_ctbs - 1).bit_length()))
    if dependent:
        raise NotImplementedError(
            "HEVC dependent slice segments not bundled")
    for _ in range(pps["extra_bits"]):
        r.u(1)
    slice_type = r.ue()
    if pps["output_flag_present"]:
        r.u(1)
    poc_lsb = 0
    n_neg_refs = 0
    if nal_type not in (NAL_IDR_W_RADL, NAL_IDR_N_LP):
        if nal_type in _IRAP_TYPES:
            raise NotImplementedError(
                "HEVC CRA/BLA pictures not bundled (IDR + trailing)")
        # trailing picture: POC lsb + slice-header short-term RPS
        poc_lsb = r.u(sps["log2_max_poc"])
        if not r.u(1):  # short_term_ref_pic_set_sps_flag
            # st_ref_pic_set(idx == num_short_term_ref_pic_sets):
            # sps carries zero sets, so no prediction flag
            n_neg = r.ue()  # num_negative_pics
            n_pos = r.ue()
            if n_pos:
                raise NotImplementedError(
                    "HEVC positive (future) references not bundled "
                    "(low-delay P layer)")
            for _ in range(n_neg):
                r.ue()      # delta_poc_s0_minus1
                if r.u(1):  # used_by_curr_pic_s0_flag
                    n_neg_refs += 1
        else:
            raise ValueError("HEVC slice references an SPS RPS but "
                             "the SPS carries none")
        # (sps long-term refs are parse-gated off in parse_sps)
        if sps["tmvp"]:
            if r.u(1):  # slice_temporal_mvp_enabled_flag
                raise NotImplementedError(
                    "HEVC temporal MV prediction not bundled")
    if slice_type == 0:
        raise NotImplementedError("HEVC B slices not bundled")
    if slice_type not in (1, 2):
        raise ValueError("HEVC invalid slice_type")
    if slice_type != 2 and nal_type in (NAL_IDR_W_RADL, NAL_IDR_N_LP):
        raise ValueError("HEVC IDR with non-I slice")
    sao_luma = sao_chroma = 0
    if sps["sao"]:
        sao_luma = r.u(1)
        sao_chroma = r.u(1)
    n_ref_l0 = 1
    max_merge = 5
    if slice_type == 1:  # P
        if r.u(1):  # num_ref_idx_active_override_flag
            n_ref_l0 = r.ue() + 1
        # pps lists_modification/weighted-pred/cabac_init gated off in
        # the shapes we parse (flags checked below for foreign PPS)
        if pps["cabac_init_present"]:
            raise NotImplementedError(
                "HEVC cabac_init_flag not bundled")
        max_merge = 5 - r.ue()
        if not 1 <= max_merge <= 5:
            raise ValueError("HEVC five_minus_max_num_merge_cand")
    qp = pps["init_qp"] + r.se()
    cb_qp_off = pps["cb_qp_offset"]
    cr_qp_off = pps["cr_qp_offset"]
    if pps["slice_chroma_qp"]:
        cb_qp_off += r.se()
        cr_qp_off += r.se()
    deblock_disabled = pps["deblocking_disabled"]
    beta_offset = pps["beta_offset"]
    tc_offset = pps["tc_offset"]
    if pps["deblocking_override"]:
        if r.u(1):  # deblocking_filter_override_flag
            deblock_disabled = r.u(1)
            if not deblock_disabled:
                beta_offset = r.se() * 2
                tc_offset = r.se() * 2
    # pps_loop_filter_across==0 and no sao/deblocking in our PPS shape
    # means no slice_loop_filter flag; foreign PPS combos:
    if pps["loop_filter_across"] and (sao_luma or sao_chroma
                                      or not deblock_disabled):
        r.u(1)
    entry_points = []
    if pps["entropy_sync"]:
        n = r.ue()
        if n:
            ln = r.ue() + 1
            for _ in range(n):
                entry_points.append(r.u(ln) + 1)
    if pps["hdr_ext"]:
        for _ in range(r.ue()):
            r.u(8)
    if not r.u(1):  # alignment_bit_equal_to_one
        raise ValueError("bad HEVC slice header byte alignment")
    r.byte_align()
    return {"first": first, "addr": addr, "qp": qp,
            "slice_type": slice_type, "poc_lsb": poc_lsb,
            "n_neg_refs": n_neg_refs, "n_ref_l0": n_ref_l0,
            "max_merge": max_merge,
            "sao_luma": sao_luma, "sao_chroma": sao_chroma,
            "cb_qp_off": cb_qp_off, "cr_qp_off": cr_qp_off,
            "deblock_disabled": deblock_disabled,
            "beta_offset": beta_offset, "tc_offset": tc_offset,
            "entry_points": entry_points}


def decode_hevc_keyframe_yuv(data: bytes):
    """Annex-B access unit (VPS/SPS/PPS + IDR slices) -> (y, u, v)
    uint8 planes at the cropped frame size. pcm_flag=1 coding units
    decode; everything entropy-coded beyond them raises the named
    seam (see module doc)."""
    sps = pps = None
    slices = []
    for nal_type, rbsp, epb_pos in _iter_nals_annexb_epb(bytes(data)):
        if nal_type == NAL_SPS:
            sps = parse_sps(rbsp)
        elif nal_type == NAL_PPS:
            pps = parse_pps(rbsp)
        elif nal_type == NAL_VPS or nal_type in (
                NAL_AUD, NAL_SEI_PREFIX, NAL_SEI_SUFFIX):
            continue
        elif nal_type < 16:
            raise NotImplementedError(
                "HEVC non-IRAP slices not bundled (keyframe layer)")
        elif nal_type in _IRAP_TYPES:
            slices.append((nal_type, rbsp, epb_pos))
    if sps is None or pps is None or not slices:
        raise ValueError("HEVC access unit missing SPS/PPS/slice")
    if sps["chroma"] != 1 or sps["bit_depth"] not in (8, 10) \
            or sps["bit_depth_c"] != sps["bit_depth"]:
        raise NotImplementedError(
            "HEVC non-4:2:0 or >10-bit streams not bundled")
    ctb_log2 = sps["ctb_log2"]
    ctb = 1 << ctb_log2
    # pure-PCM fast path only for our own encoder's stream shape
    # (CTB-sized PCM CUs, CTB-aligned geometry); everything else —
    # i.e. every real-world entropy-coded stream — goes through the
    # full Main-intra decoder in kernels/hevc_intra.py
    pcm_fast = (
        sps["pcm"]
        and sps["bit_depth"] == 8
        and sps["pcm"]["bit_depth"] == 8
        and sps["pcm"]["bit_depth_c"] == 8
        and sps["pcm"]["log2_min"] == ctb_log2
        and sps["pcm"]["log2_max"] == ctb_log2
        and sps["min_cb_log2"] < ctb_log2
        and not pps["transquant_bypass"]
        and not pps["cu_qp_delta"]
        and not pps["entropy_sync"]
        and not sps["sao"]
        and sps["pic_w"] % ctb == 0
        and sps["pic_h"] % ctb == 0
    )
    if not pcm_fast:
        from ragflow_ocr_spark.kernels import hevc_intra

        yp, up, vp = hevc_intra.decode_intra_au(
            sps, pps, slices, _parse_slice_header)
        if sps["bit_depth"] > 8:
            # keep the high byte, the repo's 16-bit-PNG convention
            sh = sps["bit_depth"] - 8
            yp = (yp >> sh).astype(np.uint8)
            up = (up >> sh).astype(np.uint8)
            vp = (vp >> sh).astype(np.uint8)
        w, h = sps["width"], sps["height"]
        return (yp[:h, :w], up[:(h + 1) // 2, :(w + 1) // 2],
                vp[:(h + 1) // 2, :(w + 1) // 2])
    w_ctbs = (sps["pic_w"] + ctb - 1) // ctb
    h_ctbs = (sps["pic_h"] + ctb - 1) // ctb
    n_ctbs = w_ctbs * h_ctbs
    yp = np.zeros((h_ctbs * ctb, w_ctbs * ctb), np.uint8)
    up = np.zeros((h_ctbs * ctb // 2, w_ctbs * ctb // 2), np.uint8)
    vp = np.zeros_like(up)
    seen = np.zeros(n_ctbs, bool)
    half = ctb // 2
    for nal_type, rbsp, _epb in slices:
        r = _BitReader(rbsp)
        hdr = _parse_slice_header(r, nal_type, sps, pps)
        dec = _CabacDecoder(r)
        split_ctx = _ctx_init(_SPLIT_CU_INIT_I, hdr["qp"])
        addr = hdr["addr"]
        while True:
            if addr >= n_ctbs:
                raise ValueError("HEVC CTB address out of range")
            if seen[addr]:
                raise ValueError("HEVC slices overlap")
            if dec.decode_decision(split_ctx) \
                    or not dec.decode_terminate():  # split / !pcm_flag
                # not the pure-PCM shape after all: a foreign stream
                # with PCM-capable SPS but entropy-coded content —
                # restart through the full Main-intra decoder
                from ragflow_ocr_spark.kernels import hevc_intra

                yp2, up2, vp2 = hevc_intra.decode_intra_au(
                    sps, pps, slices, _parse_slice_header)
                w, h = sps["width"], sps["height"]
                return (yp2[:h, :w], up2[:(h + 1) // 2, :(w + 1) // 2],
                        vp2[:(h + 1) // 2, :(w + 1) // 2])
            r.byte_align()
            cy, cx = divmod(addr, w_ctbs)
            luma = np.frombuffer(
                r.bytes_raw(ctb * ctb), np.uint8).reshape(ctb, ctb)
            cb = np.frombuffer(
                r.bytes_raw(half * half), np.uint8).reshape(half, half)
            cr = np.frombuffer(
                r.bytes_raw(half * half), np.uint8).reshape(half, half)
            yp[cy * ctb:(cy + 1) * ctb, cx * ctb:(cx + 1) * ctb] = luma
            up[cy * half:(cy + 1) * half, cx * half:(cx + 1) * half] = cb
            vp[cy * half:(cy + 1) * half, cx * half:(cx + 1) * half] = cr
            seen[addr] = True
            addr += 1
            dec.init_engine()  # spec 9.3.1: re-init after pcm_sample
            if dec.decode_terminate():  # end_of_slice_segment_flag
                break
            if addr >= n_ctbs:
                raise ValueError("HEVC slice ran past the last CTB")
    if not seen.all():
        raise ValueError("HEVC slices do not cover the frame")
    w, h = sps["width"], sps["height"]
    return (yp[:h, :w], up[:(h + 1) // 2, :(w + 1) // 2],
            vp[:(h + 1) // 2, :(w + 1) // 2])


def decode_hevc_keyframe(data: bytes) -> np.ndarray:
    """Annex-B access unit -> uint8 image ((H, W) gray or (H, W, 3))."""
    y, u, v = decode_hevc_keyframe_yuv(data)
    return _yuv_to_rgb(y, u, v)


# --------------------------------------------------------------- encode
def encode_hevc_ipcm_yuv(y: np.ndarray, u: np.ndarray,
                         v: np.ndarray) -> bytes:
    """YUV420 planes -> Annex-B IDR access unit of PCM coding units
    (byte-exact: any conformant decoder reconstructs these planes;
    the system libde265 verifies exactly that in tests). Luma dims
    must be even (4:2:0 crop units)."""
    y = np.asarray(y, np.uint8)
    h, w = y.shape
    if w % 2 or h % 2 or w < 2 or h < 2 or w * h > MAX_HEVC_PIXELS:
        raise ValueError("encode_hevc_ipcm_yuv needs even dims in budget")
    ch, cw = (h + 1) // 2, (w + 1) // 2
    u = np.asarray(u, np.uint8)
    v = np.asarray(v, np.uint8)
    if u.shape != (ch, cw) or v.shape != (ch, cw):
        raise ValueError("chroma plane shape mismatch")
    w_ctbs, h_ctbs = (w + _CTB - 1) // _CTB, (h + _CTB - 1) // _CTB
    pic_w, pic_h = w_ctbs * _CTB, h_ctbs * _CTB
    yp = np.pad(y, ((0, pic_h - h), (0, pic_w - w)), "edge")
    up = np.pad(u, ((0, pic_h // 2 - ch), (0, pic_w // 2 - cw)), "edge")
    vp = np.pad(v, ((0, pic_h // 2 - ch), (0, pic_w // 2 - cw)), "edge")
    half = _CTB // 2

    bw = _BitWriter()
    # slice segment header (IDR_W_RADL, I slice, QP 26)
    bw.u(1, 1)  # first_slice_segment_in_pic_flag
    bw.u(0, 1)  # no_output_of_prior_pics_flag
    bw.ue(0)    # slice_pic_parameter_set_id
    bw.ue(2)    # slice_type: I
    bw.se(0)    # slice_qp_delta
    bw.u(1, 1)  # alignment_bit_equal_to_one
    bw.byte_align_zero()

    enc = _CabacEncoder(bw)
    split_ctx = _ctx_init(_SPLIT_CU_INIT_I, 26)
    n_ctbs = w_ctbs * h_ctbs
    for addr in range(n_ctbs):
        cy, cx = divmod(addr, w_ctbs)
        enc.encode_decision(split_ctx, 0)  # split_cu_flag
        enc.encode_terminate(1)            # pcm_flag
        enc.flush()
        bw.byte_align_zero()               # pcm_alignment_zero_bit
        bw.bytes_raw(
            yp[cy * _CTB:(cy + 1) * _CTB,
               cx * _CTB:(cx + 1) * _CTB].tobytes())
        bw.bytes_raw(
            up[cy * half:(cy + 1) * half,
               cx * half:(cx + 1) * half].tobytes())
        bw.bytes_raw(
            vp[cy * half:(cy + 1) * half,
               cx * half:(cx + 1) * half].tobytes())
        enc.init_engine()                  # re-init after pcm_sample
        last = addr == n_ctbs - 1
        enc.encode_terminate(1 if last else 0)
        if last:
            enc.flush()
    bw.byte_align_zero()  # rbsp_slice_segment_trailing (flush carries
    #                       the stop bit — H.264 9.3.4.6 convention)
    slice_rbsp = bytes(bw.out)

    out = bytearray()
    for nal in (_nal(NAL_VPS, _vps_rbsp()),
                _nal(NAL_SPS, _sps_rbsp(pic_w, pic_h,
                                        pic_w - w, pic_h - h)),
                _nal(NAL_PPS, _pps_rbsp()),
                _nal(NAL_IDR_W_RADL, slice_rbsp)):
        out += b"\x00\x00\x00\x01" + nal
    return bytes(out)


def encode_hevc_ipcm(img: np.ndarray) -> bytes:
    """uint8 image -> Annex-B PCM access unit (even dims; the YUV
    conversion is the only lossy step — the coded layer is exact)."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_hevc_ipcm expects a uint8 image")
    return encode_hevc_ipcm_yuv(*_rgb_to_yuv(img))


# ------------------------------------------------------------ hvcC / mp4
def build_hvcc(vps_nals: list[bytes], sps_nals: list[bytes],
               pps_nals: list[bytes], nal_length_size: int = 4,
               bit_depth: int = 8) -> bytes:
    """VPS/SPS/PPS NAL units -> HEVCDecoderConfigurationRecord."""
    if not vps_nals or not sps_nals or not pps_nals:
        raise ValueError("hvcC needs at least one VPS, SPS and PPS")
    out = bytearray()
    out.append(1)                       # configurationVersion
    # profile: Main (1) for 8-bit, Main10 (2) otherwise
    out.append(1 if bit_depth == 8 else 2)
    out += struct.pack(">I", 1 << (31 - (1 if bit_depth == 8 else 2)))
    out += bytes([0b10110000, 0, 0, 0, 0, 0])  # constraint flags
    out.append(153)                     # level 5.1
    out += struct.pack(">H", 0xF000)    # min_spatial_segmentation_idc
    out.append(0xFC)                    # parallelismType
    out.append(0xFC | 1)                # chroma_format_idc 4:2:0
    out.append(0xF8 | (bit_depth - 8))  # bit_depth_luma_minus8
    out.append(0xF8 | (bit_depth - 8))  # bit_depth_chroma_minus8
    out += struct.pack(">H", 0)         # avgFrameRate
    out.append((1 << 3) | (1 << 2) | (nal_length_size - 1))
    arrays = ((NAL_VPS, vps_nals), (NAL_SPS, sps_nals),
              (NAL_PPS, pps_nals))
    out.append(len(arrays))
    for nal_type, nals in arrays:
        out.append(0x80 | nal_type)     # array_completeness=1
        out += struct.pack(">H", len(nals))
        for nal in nals:
            out += struct.pack(">H", len(nal)) + nal
    return bytes(out)


def parse_hvcc(cfg: bytes):
    """hvcC record -> (nal_length_size, [parameter-set NALs...])."""
    if len(cfg) < 23 or cfg[0] != 1:
        raise ValueError("bad hvcC configuration record")
    nls = (cfg[21] & 3) + 1
    n_arrays = cfg[22]
    pos = 23
    nals = []
    for _ in range(n_arrays):
        if pos + 3 > len(cfg):
            raise ValueError("truncated hvcC")
        n = struct.unpack_from(">H", cfg, pos + 1)[0]
        pos += 3
        for _ in range(n):
            if pos + 2 > len(cfg):
                raise ValueError("truncated hvcC")
            ln = struct.unpack_from(">H", cfg, pos)[0]
            pos += 2
            if pos + ln > len(cfg):
                raise ValueError("truncated hvcC")
            nals.append(cfg[pos:pos + ln])
            pos += ln
    return nls, nals


def hvcc_sample_to_annexb(sample: bytes, nal_length_size: int,
                          prefix_nals: list[bytes]) -> bytes:
    """Length-prefixed HVCC sample -> self-contained Annex-B access
    unit (parameter-set NALs prepended)."""
    out = bytearray()
    for nal in prefix_nals:
        out += b"\x00\x00\x00\x01" + nal
    pos = 0
    while pos + nal_length_size <= len(sample):
        ln = int.from_bytes(sample[pos:pos + nal_length_size], "big")
        pos += nal_length_size
        if ln == 0 or pos + ln > len(sample):
            raise ValueError("bad HVCC NAL length")
        out += b"\x00\x00\x00\x01" + sample[pos:pos + ln]
        pos += ln
    if pos != len(sample):
        raise ValueError("trailing bytes after HVCC NALs")
    return bytes(out)


def annexb_au_to_hvcc(au: bytes, nal_length_size: int = 4):
    """Annex-B access unit -> (hvcc_sample_of_slice_nals, vps_nals,
    sps_nals, pps_nals): parameter sets move out-of-band."""
    vps, sps, pps, body = [], [], [], bytearray()
    for nal in split_annexb(au):
        t = (nal[0] >> 1) & 0x3F
        if t == NAL_VPS:
            vps.append(nal)
        elif t == NAL_SPS:
            sps.append(nal)
        elif t == NAL_PPS:
            pps.append(nal)
        else:
            body += len(nal).to_bytes(nal_length_size, "big") + nal
    return bytes(body), vps, sps, pps
