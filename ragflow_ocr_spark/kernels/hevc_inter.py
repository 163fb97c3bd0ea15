"""HEVC low-delay P layer (ITU-T H.265 clauses 7.3.8.5-6, 8.5, 9.3):
inter-predicted trailing pictures on top of the Main-intra decoder in
kernels/hevc_intra.py.

Scope: P slices over ONE reference picture (the previously decoded
picture — the low-delay shape every single-layer GOP uses), 2Nx2N
inter CUs with merge/skip and AMVP-coded motion vectors,
QUARTER-PEL luma / EIGHTH-PEL chroma motion compensation (the spec
8-tap and 4-tap interpolation filters with exact intermediate
scaling), inter residual coding (same transform machinery as intra,
incl. transquant bypass), deblocking with real boundary strengths
(intra/cbf/MV-derived), and intra CUs inside P slices.

NAMED SEAMS (per-row errors upstream): B slices, multiple/long-term
references, temporal MV prediction (TMVP), non-2Nx2N inter
partitions, inter 4x4 TUs, weighted prediction. The encoder below
emits none of them.

PROVENANCE: every P-slice (initType 1) context initValue is
transcribed from spec Tables 9-19..9-32 and byte-verified against the
u32 arrays compiled into the system libde265 (the same .rodata region
cited in kernels/hevc_intra.py: sig @0x58ca0+42*4, gt1 @0x58b60+24*4,
gt2 @0x58b00+6*4, last @0x58ee0+18*4, csbf @0x58ea8+4, split_tr
@0x58fc8+3, cbf_chroma @0x59000+4, split_cu @0x590c0+3, part_mode
@0x59060+1, cu_skip @0x59090, pred_mode/merge/mvd/mvp/rqt_root/
ref_idx/inter_pred_idc in the 0x58a60-0x58ad8 block).

End-to-end falsification: the lossless P-GOP encoder below emits
skip, merge, AMVP-MV and residual-coded CUs, and the system libde265
must reconstruct every frame byte-exactly (tests/test_hevc_inter.py)
— wrong candidate derivation, MV coding, bS logic or any context
value breaks that comparison.

Reference parity: the reference decodes any hvc1 video via cv2/ffmpeg
(/root/reference/ocr/operators.py:41-46); with this module, mp4/webm
HEVC tracks with normal GOPs stop being keyframe-only.
"""

from __future__ import annotations

import numpy as np

from ragflow_ocr_spark.kernels import hevc as H
from ragflow_ocr_spark.kernels.h264 import _BitReader, _BitWriter
from ragflow_ocr_spark.kernels.hevc_intra import (
    IntraDecoder,
    _Ctx,
    _enc_residual,
    _encode_intra_cu16,
    _pps_lossless_rbsp,
    _sps_lossless_rbsp,
)

# ---------------------------------------------------------------------
# Context initValues, P-slice initType 1 (spec Tables 9-19..9-32;
# byte-verified against libde265 — module doc). Shared-syntax tables
# first, then the inter-only elements.
_INIT_P = {
    "sao_merge": (153,),
    "sao_type": (185,),
    "split_cu": (107, 139, 126),
    "tqb": (154,),
    "part_mode": (154, 139, 154, 154),
    "prev_intra": (154,),
    "intra_chroma": (152,),
    "split_tr": (124, 138, 94),
    "cbf_luma": (153, 111),
    "cbf_chroma": (149, 107, 167, 154),
    "tskip": (139, 139),
    "cu_qp_delta": (154, 154),
    "last_x": (125, 110, 94, 110, 95, 79, 125, 111, 110, 78, 110,
               111, 111, 95, 94, 108, 123, 108),
    "last_y": (125, 110, 94, 110, 95, 79, 125, 111, 110, 78, 110,
               111, 111, 95, 94, 108, 123, 108),
    "csbf": (121, 140, 61, 154),
    "sig": (155, 154, 139, 153, 139, 123, 123, 63, 153, 166, 183,
            140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 166,
            183, 140, 136, 153, 154, 170, 153, 123, 123, 107, 121,
            107, 121, 167, 151, 183, 140, 151, 183, 140),
    "gt1": (154, 196, 196, 167, 154, 152, 167, 182, 182, 134, 149,
            136, 153, 121, 136, 137, 169, 194, 166, 167, 154, 167,
            137, 182),
    "gt2": (107, 167, 91, 122, 107, 167),
    # inter-only elements
    "cu_skip": (197, 185, 201),
    "pred_mode": (149,),
    "merge_flag": (110,),
    "merge_idx": (122,),
    # the libde265 block {140,198,169,198} is laid out per TYPE:
    # P(gt0=140, gt1=198), B(gt0=169, gt1=198) — HM INIT_MVD order
    "mvd_gt0": (140,),
    "mvd_gt1": (198,),
    "mvp_flag": (168,),
    "rqt_root": (79,),
    "ref_idx": (153, 153),
}


# spec 8.5.3.3.3 luma sub-sample interpolation filters (qpel)
_LUMA_FILT = {
    1: (-1, 4, -10, 58, 17, -5, 1, 0),
    2: (-1, 4, -11, 40, 40, -11, 4, -1),
    3: (0, 1, -5, 17, 58, -10, 4, -1),
}
# spec 8.5.3.3.4 chroma sub-sample filters (1/8 precision)
_CHROMA_FILT = {
    1: (-2, 58, 10, -2), 2: (-4, 54, 16, -2), 3: (-6, 46, 28, -4),
    4: (-4, 36, 36, -4), 5: (-4, 28, 46, -6), 6: (-2, 16, 54, -4),
    7: (-2, 10, 58, -2),
}


def _interp_block(ref, x0, y0, w, h, mvi_x, mvi_y, fx, fy, filt,
                  taps_before, pic_w, pic_h, bd):
    """Sub-sample interpolation per spec 8.5.3.3.3/8.5.3.3.4 with the
    default uni-prediction rounding of 8.5.3.3.6: picture-edge
    clamped gather, horizontal pass, vertical pass over the 14-bit
    intermediates. fx/fy are the fractional parts in the plane's MV
    precision (quarter-pel luma, eighth-pel chroma); integer
    positions take the shift3 path."""
    taps = len(next(iter(filt.values())))
    nb = taps_before
    na = taps - 1 - nb
    shift1 = min(4, bd - 8)
    rows = np.clip(np.arange(y0 + mvi_y - (nb if fy else 0),
                             y0 + mvi_y + h + (na if fy else 0)),
                   0, pic_h - 1)
    cols = np.clip(np.arange(x0 + mvi_x - (nb if fx else 0),
                             x0 + mvi_x + w + (na if fx else 0)),
                   0, pic_w - 1)
    blk = ref[np.ix_(rows, cols)].astype(np.int64)
    if fx and fy:
        f = filt[fx]
        tmp = sum(int(f[k]) * blk[:, k:k + w] for k in range(taps))
        tmp >>= shift1
        f = filt[fy]
        p14 = sum(int(f[k]) * tmp[k:k + h, :] for k in range(taps))
        p14 >>= 6
    elif fx:
        f = filt[fx]
        p14 = sum(int(f[k]) * blk[:, k:k + w] for k in range(taps))
        p14 >>= shift1
    elif fy:
        f = filt[fy]
        p14 = sum(int(f[k]) * blk[k:k + h, :] for k in range(taps))
        p14 >>= shift1
    else:
        p14 = blk << max(2, 14 - bd)
    sh = 14 - bd
    return np.clip((p14 + (1 << (sh - 1))) >> sh, 0, (1 << bd) - 1)


class PSliceDecoder(IntraDecoder):
    """Decodes one P picture against a single reference picture.
    The reference planes are the PREVIOUS decoded picture after its
    in-loop filters (full, uncropped size)."""

    CTX_TABLE = _INIT_P

    def __init__(self, sps: dict, pps: dict, ref) -> None:
        super().__init__(sps, pps)
        self.ref_y, self.ref_cb, self.ref_cr = ref
        if self.ref_y.shape != self.y.shape:
            raise ValueError("HEVC reference/current geometry mismatch")
        g = self.done4.shape
        self.mv4 = np.zeros(g + (2,), np.int32)
        self.skip4 = np.zeros(g, bool)

    # ------------------------------------------------------ CU parse
    def _coding_unit(self, x0: int, y0: int, log2: int,
                     depth: int) -> None:
        dec, ctx = self.dec, self.ctx
        if self.hdr["slice_type"] == 2:
            return super()._coding_unit(x0, y0, log2, depth)
        self.tqb = 0
        if self.pps["transquant_bypass"]:
            self.tqb = dec.decode_decision(ctx["tqb"][0])
        cinc = 0
        if x0 > 0 and self.parsed4[y0 >> 2, (x0 - 1) >> 2]:
            cinc += int(self.skip4[y0 >> 2, (x0 - 1) >> 2])
        if y0 > 0 and self.parsed4[(y0 - 1) >> 2, x0 >> 2]:
            cinc += int(self.skip4[(y0 - 1) >> 2, x0 >> 2])
        if dec.decode_decision(ctx["cu_skip"][cinc]):
            mv = self._merge_mv(x0, y0, 1 << log2)
            self._recon_inter(x0, y0, log2, mv, residual=False)
            self._finish_inter_cu(x0, y0, log2, depth, mv, skip=True)
            return
        if dec.decode_decision(ctx["pred_mode"][0]):  # MODE_INTRA
            self._coding_unit_intra(x0, y0, log2, depth)
            return
        # inter CU: part_mode (coded at every size for inter)
        if not dec.decode_decision(ctx["part_mode"][0]):
            raise NotImplementedError(
                "HEVC non-2Nx2N inter partitions not bundled")
        n = 1 << log2
        if dec.decode_decision(ctx["merge_flag"][0]):
            mv = self._merge_mv(x0, y0, n)
            # 2Nx2N merge (non-skip): rqt_root_cbf inferred 1
            self._recon_inter(x0, y0, log2, mv, residual=True)
        else:
            if self.hdr["n_ref_l0"] > 1:
                raise NotImplementedError(
                    "HEVC multiple reference pictures not bundled")
            mvd = self._decode_mvd()
            cands = self._amvp(x0, y0, n)
            mvp = cands[dec.decode_decision(ctx["mvp_flag"][0])]
            mv = (mvp[0] + mvd[0], mvp[1] + mvd[1])
            residual = bool(dec.decode_decision(ctx["rqt_root"][0]))
            self._recon_inter(x0, y0, log2, mv, residual=residual)
        self._finish_inter_cu(x0, y0, log2, depth, mv, skip=False)

    def _decode_mvd(self):
        dec, ctx = self.dec, self.ctx
        gt0 = [dec.decode_decision(ctx["mvd_gt0"][0]) for _ in (0, 1)]
        gt1 = [dec.decode_decision(ctx["mvd_gt1"][0]) if g else 0
               for g in gt0]
        out = []
        for g0, g1 in zip(gt0, gt1):
            if not g0:
                out.append(0)
                continue
            v = 1
            if g1:
                v = 2 + self._eg(1)   # abs_mvd_minus2, EG1
            if dec.decode_bypass():   # mvd_sign_flag
                v = -v
            out.append(v)
        return out

    # ----------------------------------------------- motion candidates
    def _nb_mv(self, x: int, y: int):
        """MV of the PU covering luma (x,y), or None if outside /
        not yet parsed / not inter."""
        if x < 0 or y < 0 or x >= self.pic_w or y >= self.pic_h:
            return None
        if not self.parsed4[y >> 2, x >> 2] \
                or self.intra4[y >> 2, x >> 2]:
            return None
        return (int(self.mv4[y >> 2, x >> 2, 0]),
                int(self.mv4[y >> 2, x >> 2, 1]))

    def _merge_candidates(self, x0: int, y0: int, n: int,
                          max_merge: int):
        """8.5.3.2.2-3 spatial merge candidates (2Nx2N, single ref,
        no TMVP) + zero fill."""
        a1 = self._nb_mv(x0 - 1, y0 + n - 1)
        b1 = self._nb_mv(x0 + n - 1, y0 - 1)
        b0 = self._nb_mv(x0 + n, y0 - 1)
        a0 = self._nb_mv(x0 - 1, y0 + n)
        b2 = self._nb_mv(x0 - 1, y0 - 1)
        cands = []
        if a1 is not None:
            cands.append(a1)
        if b1 is not None and b1 != a1:
            cands.append(b1)
        if b0 is not None and b0 != b1:
            cands.append(b0)
        if a0 is not None and a0 != a1:
            cands.append(a0)
        if len(cands) < 4 and b2 is not None \
                and b2 != a1 and b2 != b1:
            cands.append(b2)
        while len(cands) < max_merge:
            cands.append((0, 0))
        return cands

    def _merge_mv(self, x0: int, y0: int, n: int):
        """Decode merge_idx (TR, first bin ctx-coded) and return the
        selected candidate."""
        dec, ctx = self.dec, self.ctx
        max_merge = self.hdr["max_merge"]
        cands = self._merge_candidates(x0, y0, n, max_merge)
        idx = 0
        if max_merge > 1:
            if dec.decode_decision(ctx["merge_idx"][0]):
                idx = 1
                while idx < max_merge - 1 and dec.decode_bypass():
                    idx += 1
        return cands[idx]

    def _amvp(self, x0: int, y0: int, n: int):
        """8.5.3.2.6 AMVP spatial candidates (single ref: the
        same-reference pass always applies, no scaling)."""
        a = None
        for x, y in ((x0 - 1, y0 + n), (x0 - 1, y0 + n - 1)):
            a = self._nb_mv(x, y)
            if a is not None:
                break
        b = None
        for x, y in ((x0 + n, y0 - 1), (x0 + n - 1, y0 - 1),
                     (x0 - 1, y0 - 1)):
            b = self._nb_mv(x, y)
            if b is not None:
                break
        cands = []
        if a is not None:
            cands.append(a)
        if b is not None and b != a:
            cands.append(b)
        while len(cands) < 2:
            cands.append((0, 0))
        return cands

    # -------------------------------------------------- inter recon
    def _mc_pred(self, x0, y0, n, mv):
        """Motion-compensated prediction for the CU: quarter-pel luma
        (8-tap), eighth-pel chroma (4-tap)."""
        py = _interp_block(self.ref_y, x0, y0, n, n,
                           mv[0] >> 2, mv[1] >> 2, mv[0] & 3,
                           mv[1] & 3, _LUMA_FILT, 3,
                           self.pic_w, self.pic_h, self.bd)
        pcb = _interp_block(self.ref_cb, x0 >> 1, y0 >> 1,
                            n >> 1, n >> 1, mv[0] >> 3, mv[1] >> 3,
                            mv[0] & 7, mv[1] & 7, _CHROMA_FILT, 1,
                            self.pic_w >> 1, self.pic_h >> 1, self.bd)
        pcr = _interp_block(self.ref_cr, x0 >> 1, y0 >> 1,
                            n >> 1, n >> 1, mv[0] >> 3, mv[1] >> 3,
                            mv[0] & 7, mv[1] & 7, _CHROMA_FILT, 1,
                            self.pic_w >> 1, self.pic_h >> 1, self.bd)
        return py, pcb, pcr

    def _recon_inter(self, x0, y0, log2, mv, residual):
        n = 1 << log2
        py, pcb, pcr = self._mc_pred(x0, y0, n, mv)
        if not residual:
            self.y[y0:y0 + n, x0:x0 + n] = py.astype(self.y.dtype)
            self.cb[y0 >> 1:(y0 + n) >> 1,
                    x0 >> 1:(x0 + n) >> 1] = pcb.astype(self.cb.dtype)
            self.cr[y0 >> 1:(y0 + n) >> 1,
                    x0 >> 1:(x0 + n) >> 1] = pcr.astype(self.cr.dtype)
            return
        self._inter_pred = (py.astype(np.int32), pcb.astype(np.int32),
                            pcr.astype(np.int32), x0, y0)
        max_depth = self.sps["hier_inter"]
        self._transform_tree_inter(x0, y0, 1 << log2, log2, 0,
                                   max_depth, True, True)

    # ------------------------------------------- inter transform tree
    def _transform_tree_inter(self, x0, y0, cb_size, log2, depth,
                              max_depth, cbf_cb, cbf_cr):
        dec, ctx = self.dec, self.ctx
        if log2 <= self.max_tb and log2 > self.min_tb \
                and depth < max_depth:
            split = dec.decode_decision(ctx["split_tr"][5 - log2])
        else:
            split = log2 > self.max_tb
        if log2 > 2:
            if depth == 0 or cbf_cb:
                cbf_cb = bool(dec.decode_decision(
                    ctx["cbf_chroma"][depth]))
            if depth == 0 or cbf_cr:
                cbf_cr = bool(dec.decode_decision(
                    ctx["cbf_chroma"][depth]))
        if split:
            if log2 - 1 == 2:
                raise NotImplementedError(
                    "HEVC inter 4x4 TUs not bundled")
            h = 1 << (log2 - 1)
            for dx, dy in ((0, 0), (h, 0), (0, h), (h, h)):
                self._transform_tree_inter(x0 + dx, y0 + dy, cb_size,
                                           log2 - 1, depth + 1,
                                           max_depth, cbf_cb, cbf_cr)
        else:
            if depth == 0 and not cbf_cb and not cbf_cr:
                cbf_luma = True  # inferred (rqt_root_cbf was 1)
            else:
                cbf_luma = bool(dec.decode_decision(
                    ctx["cbf_luma"][1 if depth == 0 else 0]))
            self._transform_unit_inter(x0, y0, log2, depth, cbf_luma,
                                       cbf_cb, cbf_cr)

    def _transform_unit_inter(self, x0, y0, log2, depth, cbf_luma,
                              cbf_cb, cbf_cr):
        py, pcb, pcr, cu_x, cu_y = self._inter_pred
        n = 1 << log2
        # mode=None: diagonal scan and DCT (no intra special cases)
        resid = self._residual(x0, y0, log2, 0, None) if cbf_luma \
            else None
        pred = py[y0 - cu_y:y0 - cu_y + n, x0 - cu_x:x0 - cu_x + n]
        out = pred if resid is None else np.clip(
            pred + resid, 0, self.maxval)
        self.y[y0:y0 + n, x0:x0 + n] = out.astype(self.y.dtype)
        n4 = 1 << (log2 - 2)
        self.done4[y0 >> 2:(y0 >> 2) + n4,
                   x0 >> 2:(x0 >> 2) + n4] = True
        if cbf_luma:
            self.cbf4[y0 >> 2:(y0 >> 2) + n4,
                      x0 >> 2:(x0 >> 2) + n4] = True
        self._mark_edges(x0, y0, n)
        # chroma (log2 > 2 TUs only in this layer)
        cx, cy, clog2 = x0 >> 1, y0 >> 1, log2 - 1
        half = 1 << clog2
        for cbf, plane, pc, cidx in ((cbf_cb, self.cb, pcb, 1),
                                     (cbf_cr, self.cr, pcr, 2)):
            cresid = self._residual(cx, cy, clog2, cidx, None) \
                if cbf else None
            cpred = pc[cy - (cu_y >> 1):cy - (cu_y >> 1) + half,
                       cx - (cu_x >> 1):cx - (cu_x >> 1) + half]
            cout = cpred if cresid is None else np.clip(
                cpred + cresid, 0, self.maxval)
            plane[cy:cy + half, cx:cx + half] = cout.astype(
                plane.dtype)

    def _finish_inter_cu(self, x0, y0, log2, depth, mv, skip):
        n = 1 << log2
        ys = slice(y0 >> 2, (y0 + n) >> 2)
        xs = slice(x0 >> 2, (x0 + n) >> 2)
        self.depth4[ys, xs] = depth
        self.qp4[ys, xs] = self._cu_qp()
        self.parsed4[ys, xs] = True
        self.mv4[ys, xs, 0] = mv[0]
        self.mv4[ys, xs, 1] = mv[1]
        self.skip4[ys, xs] = skip
        if skip:
            self.done4[ys, xs] = True
            self._mark_edges(x0, y0, n)
        elif not self.done4[ys, xs].all():
            # merge/AMVP CU whose rqt_root_cbf was 0: MC-only recon
            self.done4[ys, xs] = True
            self._mark_edges(x0, y0, n)
        self.qpy_last = self._cu_qp()

    # ------------------------------------------------- deblocking bS
    def _edge_bs(self, vertical, pos, seg) -> int:
        """8.7.2.4 for P pictures: 2 if either side intra, 1 on
        nonzero-coefficient TUs or MV difference >= 1 luma sample,
        else 0."""
        if vertical:
            pb, qb = (seg >> 2, (pos - 1) >> 2), (seg >> 2, pos >> 2)
        else:
            pb, qb = ((pos - 1) >> 2, seg >> 2), (pos >> 2, seg >> 2)
        if self.intra4[pb] or self.intra4[qb]:
            return 2
        if self.cbf4[pb] or self.cbf4[qb]:
            return 1
        if abs(int(self.mv4[pb][0]) - int(self.mv4[qb][0])) >= 4 \
                or abs(int(self.mv4[pb][1])
                       - int(self.mv4[qb][1])) >= 4:
            return 1
        return 0


# ----------------------------------------------------------- sequence
class HevcSequenceDecoder:
    """Stateful low-delay HEVC sequence decoder (the vp8_inter
    Vp8SequenceDecoder convention): feed Annex-B access units in
    decode order; IDR pictures reset the state, trailing P pictures
    reference the previous output. Each picture's in-loop filters run
    before it becomes a reference."""

    def __init__(self) -> None:
        self._sps = self._pps = None
        self._ref = None

    def decode_au_yuv(self, au: bytes):
        """One access unit -> cropped (y, cb, cr)."""
        slices = []
        pic_nal = None
        for nal_type, rbsp, epb in H._iter_nals_annexb_epb(bytes(au)):
            if nal_type == H.NAL_SPS:
                self._sps = H.parse_sps(rbsp)
            elif nal_type == H.NAL_PPS:
                self._pps = H.parse_pps(rbsp)
            elif nal_type in (H.NAL_VPS, H.NAL_AUD, H.NAL_SEI_PREFIX,
                              H.NAL_SEI_SUFFIX):
                continue
            elif nal_type in H._IRAP_TYPES or nal_type < 16:
                if pic_nal is None:
                    pic_nal = nal_type
                slices.append((nal_type, rbsp, epb))
        if self._sps is None or self._pps is None or not slices:
            raise ValueError("HEVC access unit missing SPS/PPS/slice")
        sps, pps = self._sps, self._pps
        if pic_nal in H._IRAP_TYPES:
            d = IntraDecoder(sps, pps)
        else:
            if self._ref is None:
                raise ValueError("HEVC trailing picture before IDR")
            d = PSliceDecoder(sps, pps, self._ref)
        for nal_type, rbsp, epb in slices:
            r = _BitReader(rbsp)
            hdr = H._parse_slice_header(r, nal_type, sps, pps)
            if pic_nal not in H._IRAP_TYPES \
                    and hdr["slice_type"] == 1 \
                    and hdr["n_neg_refs"] != 1:
                raise NotImplementedError(
                    "HEVC multi-reference RPS not bundled "
                    "(single-ref low-delay layer)")
            d.decode_slice(rbsp, hdr, r.pos, epb)
        if not d.seen.all():
            raise ValueError("HEVC slices do not cover the frame")
        d._deblock()
        d._apply_sao()
        self._ref = (d.y, d.cb, d.cr)
        w, h = sps["width"], sps["height"]
        return (d.y[:h, :w].copy(),
                d.cb[:(h + 1) // 2, :(w + 1) // 2].copy(),
                d.cr[:(h + 1) // 2, :(w + 1) // 2].copy())

    def decode_au(self, au: bytes) -> np.ndarray:
        """One access unit -> uint8 image ((H, W) gray or (H, W, 3));
        >8-bit planes keep the high byte (the repo convention)."""
        from ragflow_ocr_spark.kernels.h264 import _yuv_to_rgb

        y, cb, cr = self.decode_au_yuv(au)
        if y.dtype != np.uint8:
            sh = self._sps["bit_depth"] - 8
            y = (y >> sh).astype(np.uint8)
            cb = (cb >> sh).astype(np.uint8)
            cr = (cr >> sh).astype(np.uint8)
        return _yuv_to_rgb(y, cb, cr)


def decode_hevc_gop_yuv(data: bytes):
    """Annex-B stream (IDR + trailing P pictures) -> list of cropped
    (y, cb, cr) planes."""
    dec = HevcSequenceDecoder()
    return [dec.decode_au_yuv(au) for au in split_hevc_aus(data)]


def split_hevc_aus(data: bytes) -> list[bytes]:
    """Split an Annex-B stream into access units: a new AU starts at
    each VCL NAL whose first_slice_segment_in_pic_flag is set; leading
    parameter sets attach to the following AU."""
    data = bytes(data)
    # locate start codes on the RAW stream so AU bytes round-trip
    marks = []  # (offset, nal_type, first_slice_flag)
    i = data.find(b"\x00\x00\x01")
    while i >= 0:
        start = i + 3
        j = data.find(b"\x00\x00\x01", start)
        if start + 2 < len(data):
            h0 = data[start]
            nal_type = (h0 >> 1) & 0x3F
            first = bool(data[start + 2] & 0x80)
            off = i - 1 if i > 0 and data[i - 1] == 0 else i
            marks.append((off, nal_type, first))
        i = j
    if not marks:
        raise ValueError("no Annex-B start code")
    cuts = []
    for k, (off, nal_type, first) in enumerate(marks):
        if (nal_type in H._IRAP_TYPES or nal_type < 16) and first:
            # attach any immediately preceding parameter sets
            cut = k
            while cut > 0 and marks[cut - 1][1] >= 32:
                cut -= 1
            cuts.append(cut)
    if not cuts or cuts[0] != 0:
        cuts = [0] + [c for c in cuts if c != 0]
    aus = []
    for a, b in zip(cuts, cuts[1:] + [len(marks)]):
        lo = marks[a][0]
        hi = marks[b][0] if b < len(marks) else len(data)
        aus.append(data[lo:hi])
    return aus


# ------------------------------------------------------------ encoder
_MV_CANDS = ((0, 0), (2, 0), (-2, 0), (0, 2), (0, -2), (4, 0),
             (-4, 0), (0, 4), (0, -4), (2, 2), (-2, -2), (8, 0),
             (0, 8), (-8, 0), (0, -8))  # full-pel, even (integer
#                                         chroma offsets in 4:2:0)


def encode_hevc_lossless_gop_aus(frames, intra_every: int = 0,
                                 frac_mv_every: int = 0,
                                 bit_depth: int = 8) -> list[bytes]:
    """Per-picture Annex-B access units of the lossless GOP: [0] is
    VPS/SPS/PPS + IDR, the rest one TRAIL_R P picture each (the mp4
    sample shape)."""
    return split_hevc_aus(
        encode_hevc_lossless_gop_yuv(frames, intra_every,
                                     frac_mv_every, bit_depth))


def encode_hevc_lossless_gop_yuv(frames, intra_every: int = 0,
                                 frac_mv_every: int = 0,
                                 bit_depth: int = 8) -> bytes:
    """[(y, u, v), ...] -> Annex-B IDR + trailing-P stream, lossless
    (transquant bypass; CTB = CU = TU = 16; skip / merge / AMVP
    integer-MV inter CUs chosen by exact-match search over
    _MV_CANDS, zero-MV + residual otherwise). Every conformant
    decoder reconstructs the frames byte-exactly; loop filters are
    disabled so references equal sources."""
    from ragflow_ocr_spark.kernels.hevc_intra import (
        encode_hevc_intra_lossless_yuv)

    if not frames:
        raise ValueError("empty GOP")
    if len(frames) > 250:
        raise ValueError("GOP exceeds the 8-bit POC budget")
    if bit_depth not in (8, 10):
        raise ValueError("bit_depth must be 8 or 10")
    dt = np.uint8 if bit_depth == 8 else np.uint16
    y0, u0, v0 = frames[0]
    h, w = np.asarray(y0).shape
    out = bytearray(encode_hevc_intra_lossless_yuv(
        y0, u0, v0, bit_depth=bit_depth))
    prev = (np.asarray(y0, dt), np.asarray(u0, dt),
            np.asarray(v0, dt))
    for poc, (fy, fu, fv) in enumerate(frames[1:], start=1):
        fy = np.asarray(fy, dt)
        fu = np.asarray(fu, dt)
        fv = np.asarray(fv, dt)
        if fy.shape != (h, w):
            raise ValueError("GOP frames must share one geometry")
        out += _encode_p_picture(fy, fu, fv, prev, poc, w, h,
                                 intra_every, frac_mv_every,
                                 bit_depth)
        prev = (fy, fu, fv)
    return bytes(out)


def _encode_p_picture(fy, fu, fv, ref, poc, w, h,
                      intra_every: int = 0,
                      frac_mv_every: int = 0,
                      bit_depth: int = 8) -> bytes:
    ctb = 16
    w_ctbs, h_ctbs = -(-w // ctb), -(-h // ctb)
    pic_w, pic_h = w_ctbs * ctb, h_ctbs * ctb
    yp = np.pad(fy, ((0, pic_h - h), (0, pic_w - w)), "edge")
    up = np.pad(fu, ((0, pic_h // 2 - ((h + 1) // 2)),
                     (0, pic_w // 2 - ((w + 1) // 2))), "edge")
    vp = np.pad(fv, ((0, pic_h // 2 - ((h + 1) // 2)),
                     (0, pic_w // 2 - ((w + 1) // 2))), "edge")
    ry = np.pad(ref[0], ((0, pic_h - h), (0, pic_w - w)), "edge")
    ru = np.pad(ref[1], ((0, pic_h // 2 - ((h + 1) // 2)),
                         (0, pic_w // 2 - ((w + 1) // 2))), "edge")
    rv = np.pad(ref[2], ((0, pic_h // 2 - ((h + 1) // 2)),
                         (0, pic_w // 2 - ((w + 1) // 2))), "edge")

    sps_rbsp = _sps_lossless_rbsp(pic_w, pic_h, pic_w - w,
                                  pic_h - h, bit_depth)
    sps = H.parse_sps(sps_rbsp)
    pps = H.parse_pps(_pps_lossless_rbsp())
    # decoder-state twin: prediction/candidate derivation must match
    state = PSliceDecoder(sps, pps, (ry, ru, rv))
    state.hdr = {"max_merge": 1, "slice_type": 1, "n_ref_l0": 1}
    state.slice_qp = 26

    bw = _BitWriter()
    bw.u(1, 1)   # first_slice_segment_in_pic_flag
    bw.ue(0)     # slice_pic_parameter_set_id
    bw.ue(1)     # slice_type: P
    bw.u(poc & 0xFF, 8)  # slice_pic_order_cnt_lsb (log2_max_poc 8)
    bw.u(0, 1)   # short_term_ref_pic_set_sps_flag
    bw.ue(1)     # num_negative_pics
    bw.ue(0)     # num_positive_pics
    bw.ue(0)     # delta_poc_s0_minus1
    bw.u(1, 1)   # used_by_curr_pic_s0_flag
    bw.u(0, 1)   # num_ref_idx_active_override_flag
    bw.ue(4)     # five_minus_max_num_merge_cand -> MaxNumMergeCand 1
    bw.se(0)     # slice_qp_delta (QP 26)
    bw.u(1, 1)   # alignment_bit_equal_to_one
    bw.byte_align_zero()

    enc = H._CabacEncoder(bw)
    ctx = _Ctx(26, _INIT_P).t

    def mc(ref_plane, x0b, y0b, n, mvx, mvy, shift):
        pw, ph = pic_w >> shift, pic_h >> shift
        rows = np.clip(np.arange(y0b + mvy, y0b + mvy + n), 0, ph - 1)
        cols = np.clip(np.arange(x0b + mvx, x0b + mvx + n), 0, pw - 1)
        return ref_plane[np.ix_(rows, cols)]

    n_ctbs = w_ctbs * h_ctbs
    half = ctb >> 1
    for addr in range(n_ctbs):
        cy, cx = divmod(addr, w_ctbs)
        x0, y0 = cx * ctb, cy * ctb
        src_y = yp[y0:y0 + ctb, x0:x0 + ctb]
        src_u = up[y0 >> 1:(y0 >> 1) + half, x0 >> 1:(x0 >> 1) + half]
        src_v = vp[y0 >> 1:(y0 >> 1) + half, x0 >> 1:(x0 >> 1) + half]

        def matches(mvx, mvy):
            return (np.array_equal(
                mc(ry, x0, y0, ctb, mvx, mvy, 0), src_y)
                and np.array_equal(
                    mc(ru, x0 >> 1, y0 >> 1, half, mvx >> 1,
                       mvy >> 1, 1), src_u)
                and np.array_equal(
                    mc(rv, x0 >> 1, y0 >> 1, half, mvx >> 1,
                       mvy >> 1, 1), src_v))

        # candidate MV (quarter-pel) exactly reproducing the block
        best = None
        for fx, fyv in _MV_CANDS:
            if matches(fx, fyv):
                best = (fx << 2, fyv << 2)
                break
        merge0 = state._merge_candidates(x0, y0, ctb, 1)[0]
        enc.encode_decision(ctx["tqb"][0], 1)
        cinc = 0
        if x0 > 0 and state.parsed4[y0 >> 2, (x0 - 1) >> 2]:
            cinc += int(state.skip4[y0 >> 2, (x0 - 1) >> 2])
        if y0 > 0 and state.parsed4[(y0 - 1) >> 2, x0 >> 2]:
            cinc += int(state.skip4[(y0 - 1) >> 2, x0 >> 2])
        if intra_every and addr % intra_every == intra_every - 1:
            # forced MODE_INTRA CU in a P slice (refresh pattern)
            enc.encode_decision(ctx["cu_skip"][cinc], 0)
            enc.encode_decision(ctx["pred_mode"][0], 1)
            state.tqb = 1
            _encode_intra_cu16(state, enc, ctx, x0, y0, yp, up, vp)
            enc.encode_terminate(0 if addr < n_ctbs - 1 else 1)
            if addr == n_ctbs - 1:
                enc.flush()
            continue
        if best is not None and best == merge0:
            # skip: MaxNumMergeCand 1 -> no merge_idx bins
            enc.encode_decision(ctx["cu_skip"][cinc], 1)
            state.tqb = 1
            state._recon_inter(x0, y0, 4, best, residual=False)
            state._finish_inter_cu(x0, y0, 4, 0, best, skip=True)
            enc.encode_terminate(0 if addr < n_ctbs - 1 else 1)
            if addr == n_ctbs - 1:
                enc.flush()
            continue
        enc.encode_decision(ctx["cu_skip"][cinc], 0)
        enc.encode_decision(ctx["pred_mode"][0], 0)  # MODE_INTER
        enc.encode_decision(ctx["part_mode"][0], 1)  # PART_2Nx2N

        def encode_amvp(target_mv):
            # mvd_coding (7.3.8.9) comes BEFORE mvp_l0_flag
            cands = state._amvp(x0, y0, ctb)
            mvd = (target_mv[0] - cands[0][0],
                   target_mv[1] - cands[0][1])
            gt0 = [int(v != 0) for v in mvd]
            for g in gt0:
                enc.encode_decision(ctx["mvd_gt0"][0], g)
            gt1 = [int(abs(v) > 1) for v in mvd]
            for g0, g1 in zip(gt0, gt1):
                if g0:
                    enc.encode_decision(ctx["mvd_gt1"][0], g1)
            for v, g0, g1 in zip(mvd, gt0, gt1):
                if not g0:
                    continue
                if g1:
                    _enc_eg(enc, abs(v) - 2, 1)
                enc.encode_bypass(1 if v < 0 else 0)
            enc.encode_decision(ctx["mvp_flag"][0], 0)

        if best is not None:
            # explicit MV via AMVP, exact match: no residual
            enc.encode_decision(ctx["merge_flag"][0], 0)
            encode_amvp(best)
            mv = best
            has_resid = False
            coded_root = True
        else:
            mv = (0, 0)
            if frac_mv_every and addr % frac_mv_every \
                    == frac_mv_every - 1:
                # fractional-pel MV (residual-corrected): exercises
                # the 8/4-tap interpolation filters end to end
                mv = (1, 2)  # quarter-pel luma, eighth-pel chroma
            if mv == merge0:
                enc.encode_decision(ctx["merge_flag"][0], 1)
                has_resid = True   # rqt_root_cbf inferred 1
                coded_root = False
            else:
                enc.encode_decision(ctx["merge_flag"][0], 0)
                encode_amvp(mv)
                has_resid = True
                coded_root = True
        if not has_resid:
            # AMVP with exact-match MV: no residual
            enc.encode_decision(ctx["rqt_root"][0], 0)
            state.tqb = 1
            state._recon_inter(x0, y0, 4, mv, residual=False)
            state._finish_inter_cu(x0, y0, 4, 0, mv, skip=False)
        else:
            # prediction through the decoder twin's interpolator so
            # the residual corrects against the exact spec pred
            pred_y, pred_u, pred_v = state._mc_pred(x0, y0, ctb, mv)
            res_y = src_y.astype(np.int32) - pred_y.astype(np.int32)
            res_u = src_u.astype(np.int32) - pred_u.astype(np.int32)
            res_v = src_v.astype(np.int32) - pred_v.astype(np.int32)
            cbf_l = bool(res_y.any())
            cbf_b = bool(res_u.any())
            cbf_r = bool(res_v.any())
            if coded_root:  # AMVP zero-MV path codes rqt_root
                enc.encode_decision(ctx["rqt_root"][0], 1)
            # transform tree depth0 leaf (TU 16): no split flag
            enc.encode_decision(ctx["cbf_chroma"][0], int(cbf_b))
            enc.encode_decision(ctx["cbf_chroma"][0], int(cbf_r))
            if cbf_b or cbf_r:
                enc.encode_decision(ctx["cbf_luma"][1], int(cbf_l))
            elif not cbf_l:
                # inferred cbf_luma==1 but luma residual is zero:
                # impossible here (an exact match would have taken
                # the skip/AMVP path above)
                raise AssertionError("zero residual on coded path")
            if cbf_l:
                _enc_residual(enc, ctx, res_y, 4, 0)
            if cbf_b:
                _enc_residual(enc, ctx, res_u, 3, 1)
            if cbf_r:
                _enc_residual(enc, ctx, res_v, 3, 2)
            state.tqb = 1
            state._recon_inter(x0, y0, 4, mv, residual=False)
            # overwrite with the true reconstruction (lossless)
            state.y[y0:y0 + ctb, x0:x0 + ctb] = src_y
            state.cb[y0 >> 1:(y0 >> 1) + half,
                     x0 >> 1:(x0 >> 1) + half] = src_u
            state.cr[y0 >> 1:(y0 >> 1) + half,
                     x0 >> 1:(x0 >> 1) + half] = src_v
            state._finish_inter_cu(x0, y0, 4, 0, mv, skip=False)
            if cbf_l:
                state.cbf4[y0 >> 2:(y0 + ctb) >> 2,
                           x0 >> 2:(x0 + ctb) >> 2] = True
        enc.encode_terminate(0 if addr < n_ctbs - 1 else 1)
        if addr == n_ctbs - 1:
            enc.flush()
    bw.byte_align_zero()
    return b"\x00\x00\x00\x01" + H._nal_hdr(1) \
        + H._add_epb(bytes(bw.out))  # TRAIL_R


def _enc_eg(enc, v: int, k: int) -> None:
    """Encode EGk via bypass bins (dual of hevc_intra's _eg)."""
    count = k
    while v >= (1 << count):
        enc.encode_bypass(1)
        v -= 1 << count
        count += 1
    enc.encode_bypass(0)
    if count:
        enc.encode_bypass_bits(v, count)
