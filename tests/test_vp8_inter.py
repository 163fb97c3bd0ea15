"""VP8 inter-frame (P-frame) decode — kernels/vp8_inter.

Strategy mirrors the keyframe layer's: the in-repo fixture encoder
shares the MV codec, near-MV predictor and token writer with the
decoder, so round trips pin the bitstream machinery; reconstruction
exactness is pinned against INDEPENDENT per-pixel references computed
in this file (edge-replicated integer shifts, a scalar two-pass
six-tap convolution), not against the code under test."""

from __future__ import annotations

import numpy as np
import pytest

from ragflow_ocr_spark.kernels import vp8 as v
from ragflow_ocr_spark.kernels import vp8_inter as vi
from ragflow_ocr_spark.kernels import webp

W, H = 48, 32
N_MB = (W // 16) * (H // 16)


def _patterned_key(seed=3):
    rng = np.random.RandomState(seed)
    mbs = []
    for _ in range(N_MB):
        y2 = [0] * 16
        y2[0] = int(rng.randint(-25, 25))
        yb = [[0] * 16 for _ in range(16)]
        for b in range(16):
            yb[b][1] = int(rng.randint(-12, 12))
        mbs.append({"ymode": v.DC_PRED, "y": yb, "y2": y2})
    key, expected = v.encode_vp8_frame(W, H, mbs)
    return key, expected


def _zero_mbs():
    return [{"mode": "zero"} for _ in range(N_MB)]


# ---------------------------------------------------------------- MV codec


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mv_component_round_trip(seed):
    rng = np.random.RandomState(seed)
    vals = list(rng.randint(-1000, 1001, size=200)) + [0, 7, -7, 8, -8,
                                                       15, 16, 1023, -1023]
    be = v.BoolEncoder()
    for x in vals:
        vi.write_mv_component(be, vi.MV_DEFAULT_PROBS[0], int(x))
    bd = v.BoolDecoder(be.finish())
    for x in vals:
        assert vi.read_mv_component(bd, vi.MV_DEFAULT_PROBS[0]) == int(x)


def test_mv_pair_round_trip():
    be = v.BoolEncoder()
    pairs = [(0, 0), (2, -6), (64, 128), (-2046, 2046), (8, -8)]
    for p in pairs:
        vi.write_mv(be, vi.MV_DEFAULT_PROBS, p)
    bd = v.BoolDecoder(be.finish())
    for p in pairs:
        assert vi.read_mv(bd, vi.MV_DEFAULT_PROBS) == p


# ------------------------------------------------------------- MC filters


def test_sixtap_matches_scalar_convolution():
    rng = np.random.RandomState(11)
    plane = rng.randint(0, 256, size=(24, 40)).astype(np.uint8)
    P = vi._pad_ref(plane)
    for mvr, mvc in ((2, 6), (1, 0), (0, 5), (7, 7), (-3, 11)):
        out = vi.predict_block(P, 4, 8, 8, 8, mvr, mvc)
        # independent scalar two-pass
        fr, fc = mvr & 7, mvc & 7
        yo, xo = mvr >> 3, mvc >> 3
        Pi = np.pad(plane.astype(int), 8, mode="edge")
        f = vi.SIXTAP_FILTERS
        exp = np.zeros((8, 8), int)
        for y in range(8):
            for x in range(8):
                sy, sx = 4 + yo + y + 8, 8 + xo + x + 8
                if fc and fr:
                    col = []
                    for k in range(6):
                        s = sum(Pi[sy + k - 2, sx + j - 2] * f[fc][j]
                                for j in range(6))
                        col.append(min(255, max(0, (s + 64) >> 7)))
                    s = sum(col[k] * f[fr][k] for k in range(6))
                elif fc:
                    s = sum(Pi[sy, sx + j - 2] * f[fc][j] for j in range(6))
                elif fr:
                    s = sum(Pi[sy + k - 2, sx] * f[fr][k] for k in range(6))
                else:
                    s = Pi[sy, sx] << 7
                exp[y, x] = min(255, max(0, (s + 64) >> 7))
        assert (out == exp).all(), (mvr, mvc)


def test_bilinear_matches_scalar():
    rng = np.random.RandomState(12)
    plane = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    P = vi._pad_ref(plane)
    out = vi.predict_block(P, 0, 0, 8, 8, 3, 5, bilinear=True)
    f = vi.BILINEAR_FILTERS
    Pi = np.pad(plane.astype(int), 8, mode="edge")
    exp = np.zeros((8, 8), int)
    for y in range(8):
        for x in range(8):
            a = (Pi[8 + y, 8 + x] * f[5][0] + Pi[8 + y, 9 + x] * f[5][1]
                 + 64) >> 7
            b = (Pi[9 + y, 8 + x] * f[5][0] + Pi[9 + y, 9 + x] * f[5][1]
                 + 64) >> 7
            exp[y, x] = (min(255, max(0, a)) * f[3][0]
                         + min(255, max(0, b)) * f[3][1] + 64) >> 7
            exp[y, x] = min(255, max(0, exp[y, x]))
    assert (out == exp).all()


# ------------------------------------------------------ sequence decoding


def test_p_frame_zero_skip_reproduces_keyframe():
    key, _ = _patterned_key()
    dec = vi.Vp8SequenceDecoder()
    f0 = dec.decode_frame(key)
    f1 = dec.decode_frame(vi.encode_vp8_inter_frame(W, H, _zero_mbs()))
    assert np.array_equal(f0, f1)


def test_p_frame_integer_mv_is_edge_replicated_shift():
    key, _ = _patterned_key()
    dec = vi.Vp8SequenceDecoder()
    f0 = dec.decode_frame(key)
    # MV (+1 row, -2 cols): prediction samples (y+1, x-2)
    f1 = dec.decode_frame(vi.encode_vp8_inter_frame(
        W, H, [{"mode": "new", "mv": (8, -16)} for _ in range(N_MB)]))
    P = np.pad(f0.astype(int), 8, mode="edge")
    exp = P[8 + 1:8 + 1 + H, 8 - 2:8 - 2 + W].astype(np.uint8)
    assert np.array_equal(f1, exp)


def test_p_frame_chain_accumulates_motion():
    key, _ = _patterned_key()
    dec = vi.Vp8SequenceDecoder()
    f0 = dec.decode_frame(key)
    g = None
    for _ in range(5):
        g = dec.decode_frame(vi.encode_vp8_inter_frame(
            W, H, [{"mode": "new", "mv": (0, 8)} for _ in range(N_MB)]))
    P = np.pad(f0.astype(int), 8, mode="edge")
    exp = P[8:8 + H, 8 + 5:8 + 5 + W].astype(np.uint8)
    assert np.array_equal(g, exp)


def test_p_frame_fractional_mv_flat_stays_flat():
    key = v.encode_vp8_flat_payload(W, H, (100, 128, 128))
    dec = vi.Vp8SequenceDecoder()
    f0 = dec.decode_frame(key)
    for mv in ((4, 4), (2, 6), (6, 2)):
        f = dec.decode_frame(vi.encode_vp8_inter_frame(
            W, H, [{"mode": "new", "mv": mv} for _ in range(N_MB)]))
        assert np.array_equal(f, f0), mv


def test_p_frame_fractional_mv_on_pattern_matches_scalar():
    key, _ = _patterned_key(seed=13)
    dec = vi.Vp8SequenceDecoder()
    dec.decode_frame(key)
    refY = dec.last.Y.astype(int)
    mv = (2, 6)
    f1 = dec.decode_frame(vi.encode_vp8_inter_frame(
        W, H, [{"mode": "new", "mv": mv} for _ in range(N_MB)]))
    # scalar two-pass sixtap over the whole luma plane
    P = np.pad(refY, 8, mode="edge")
    f = vi.SIXTAP_FILTERS
    fr, fc = mv[0] & 7, mv[1] & 7
    tmp = np.zeros((H + 5, W), int)
    for y in range(H + 5):
        for x in range(W):
            s = sum(P[8 + y - 2, 8 + x - 2 + k] * f[fc][k] for k in range(6))
            tmp[y, x] = min(255, max(0, (s + 64) >> 7))
    out = np.zeros((H, W), int)
    for y in range(H):
        for x in range(W):
            s = sum(tmp[y + k, x] * f[fr][k] for k in range(6))
            out[y, x] = min(255, max(0, (s + 64) >> 7))
    exp = np.clip((298 * (out - 16) + 128) >> 8, 0, 255).astype(np.uint8)
    assert np.array_equal(f1, exp)


def test_split_mv_per_subblock_shifts():
    key, _ = _patterned_key(seed=5)
    dec = vi.Vp8SequenceDecoder()
    dec.decode_frame(key)
    refY = dec.last.Y.astype(int)
    # subblock (r, c) shifts right by c pixels (integer MVs)
    mvs = [(0, (sb & 3) * 8) for sb in range(16)]
    dec.decode_frame(vi.encode_vp8_inter_frame(
        W, H, [{"mode": "split", "mvs": mvs} for _ in range(N_MB)]))
    Y1 = dec.last.Y.astype(int)
    P = np.pad(refY, 8, mode="edge")
    for mr in range(H // 16):
        for mc in range(W // 16):
            for sb in range(16):
                br, bc = sb >> 2, sb & 3
                y0, x0 = mr * 16 + br * 4, mc * 16 + bc * 4
                exp = P[8 + y0:8 + y0 + 4, 8 + x0 + bc:8 + x0 + bc + 4]
                assert (Y1[y0:y0 + 4, x0:x0 + 4] == exp).all(), (mr, mc, sb)


def test_nearest_mode_propagates_neighbor_mv():
    key, _ = _patterned_key(seed=9)
    dec = vi.Vp8SequenceDecoder()
    f0 = dec.decode_frame(key)
    spec = [{"mode": "new", "mv": (16, 8)}] + \
        [{"mode": "nearest"} for _ in range(N_MB - 1)]
    f1 = dec.decode_frame(vi.encode_vp8_inter_frame(W, H, spec))
    # every MB ends up with (16, 8): 2px down, 1px right sampling
    P = np.pad(f0.astype(int), 8, mode="edge")
    exp = P[8 + 2:8 + 2 + H, 8 + 1:8 + 1 + W].astype(np.uint8)
    assert np.array_equal(f1, exp)


def test_all_intra_p_frame_equals_keyframe_reconstruction():
    """Reconstruction rules for intra MBs are frame-type independent:
    a P frame made entirely of intra MBs must decode identically to a
    keyframe with the same modes/levels (only the entropy coding of
    the mode symbols differs)."""
    rng = np.random.RandomState(21)
    kf_mbs, p_mbs = [], []
    for i in range(N_MB):
        ym = (v.DC_PRED, v.V_PRED, v.H_PRED, v.TM_PRED)[i % 4]
        y2 = [0] * 16
        y2[0] = int(rng.randint(-15, 15))
        yb = [[0] * 16 for _ in range(16)]
        yb[3][1] = int(rng.randint(-9, 9))
        kf_mbs.append({"ymode": ym, "uvmode": v.DC_PRED, "y": yb, "y2": y2})
        p_mbs.append({"intra": True, "ymode": ym, "uvmode": v.DC_PRED,
                      "y": yb, "y2": y2})
    key, expected = v.encode_vp8_frame(W, H, kf_mbs)
    dec = vi.Vp8SequenceDecoder()
    dec.decode_frame(v.encode_vp8_flat_payload(W, H, (80, 128, 128)))
    f1 = dec.decode_frame(vi.encode_vp8_inter_frame(W, H, p_mbs))
    assert np.array_equal(f1, expected)


def test_bpred_intra_inside_inter_frame():
    key, _ = _patterned_key(seed=2)
    dec = vi.Vp8SequenceDecoder()
    dec.decode_frame(key)
    spec = [{"intra": True, "ymode": v.B_PRED,
             "bmodes": [i % 10 for i in range(16)]}] + \
        [{"mode": "zero"} for _ in range(N_MB - 1)]
    f = dec.decode_frame(vi.encode_vp8_inter_frame(W, H, spec))
    assert f.shape in ((H, W), (H, W, 3))


def test_golden_reference_and_refresh():
    key, _ = _patterned_key(seed=4)
    dec = vi.Vp8SequenceDecoder()
    f0 = dec.decode_frame(key)
    # move LAST 3px right, refreshing golden at the keyframe position
    dec.decode_frame(vi.encode_vp8_inter_frame(
        W, H, [{"mode": "new", "mv": (0, 24)} for _ in range(N_MB)]))
    # now reference GOLDEN (still the keyframe) with zero MV → f0 again
    f2 = dec.decode_frame(vi.encode_vp8_inter_frame(
        W, H, [{"mode": "new", "mv": (0, 0), "ref": "golden"}
               for _ in range(N_MB)]))
    assert np.array_equal(f2, f0)


def test_inter_residuals_add_over_prediction():
    key = v.encode_vp8_flat_payload(W, H, (100, 128, 128))
    dec = vi.Vp8SequenceDecoder()
    f0 = dec.decode_frame(key)
    y2 = [8] + [0] * 15
    f1 = dec.decode_frame(vi.encode_vp8_inter_frame(
        W, H, [{"mode": "zero", "y2": y2} for _ in range(N_MB)]))
    # expected: Y += idct(dc from iwht of dequantized y2)
    hdr = v._FrameHeader()
    hdr.segmentation_enabled = 0
    hdr.q_index = 0
    hdr.y1dc_delta = hdr.y2dc_delta = hdr.y2ac_delta = 0
    hdr.uvdc_delta = hdr.uvac_delta = 0
    _, _, y2dc, _, _, _ = v._quant_factors(hdr, 0)
    dcs = v.iwht4x4(np.array([8 * y2dc] + [0] * 15, np.int32))
    coeffs = np.zeros(16, np.int32)
    coeffs[0] = dcs[0]
    delta = v.idct4x4(coeffs)[0, 0]
    y_new = min(255, max(0, 100 + int(delta)))
    exp = np.clip((298 * (y_new - 16) + 128) >> 8, 0, 255)
    assert (f1 == exp).all(), (np.unique(f1), exp)
    assert not np.array_equal(f1, f0)


def test_loop_filter_runs_on_inter_frames():
    key, _ = _patterned_key(seed=6)
    dec = vi.Vp8SequenceDecoder()
    dec.decode_frame(key)
    yb = [[0] * 16 for _ in range(16)]
    yb[0][1] = 11
    f = dec.decode_frame(vi.encode_vp8_inter_frame(
        W, H, [{"mode": "zero", "y": yb, "y2": [2] + [0] * 15}
               for _ in range(N_MB)], filter_level=24))
    assert f.shape in ((H, W), (H, W, 3))
    # flat frames stay flat through the loop filter
    dec2 = vi.Vp8SequenceDecoder()
    g0 = dec2.decode_frame(v.encode_vp8_flat_payload(W, H, (90, 128, 128)))
    g1 = dec2.decode_frame(vi.encode_vp8_inter_frame(
        W, H, _zero_mbs(), filter_level=30))
    assert np.array_equal(g0, g1)


def _lf_delta_decode(key, mbs, **kw):
    dec = vi.Vp8SequenceDecoder()
    dec.decode_frame(key)
    return dec.decode_frame(vi.encode_vp8_inter_frame(W, H, mbs, **kw))


@pytest.mark.parametrize("mode,delta_idx", [("new", 2), ("split", 3)])
def test_mode_lf_delta_mapping(mode, delta_idx):
    """RFC 6386 reference decoder (calculate_filter_level): SPLITMV
    takes mode_lf_deltas[3], other inter-with-MV modes take [2]."""
    key, _ = _patterned_key(seed=9)
    yb = [[0] * 16 for _ in range(16)]
    for b in range(16):
        yb[b][0] = 18 if b % 2 else -18   # steps at every inner edge
    if mode == "split":
        spec = {"mode": "split", "mvs": [(0, 0)] * 16, "y": yb}
    else:
        spec = {"mode": "new", "mv": (0, 0), "y": yb,
                "y2": [0] * 16}
    mbs = [dict(spec) for _ in range(N_MB)]
    base = _lf_delta_decode(key, mbs, filter_level=0)
    filt = _lf_delta_decode(key, mbs, filter_level=40)
    assert not np.array_equal(base, filt)  # the filter does something
    kill = [0, 0, 0, 0]
    kill[delta_idx] = -63
    other = [0, 0, 0, 0]
    other[5 - delta_idx] = -63             # 2 <-> 3
    killed = _lf_delta_decode(key, mbs, filter_level=40,
                              mode_lf_deltas=kill)
    assert np.array_equal(killed, base)    # this mode's delta applied
    kept = _lf_delta_decode(key, mbs, filter_level=40,
                            mode_lf_deltas=other)
    assert np.array_equal(kept, filt)      # the other mode's delta ignored


def test_error_paths():
    dec = vi.Vp8SequenceDecoder()
    with pytest.raises(ValueError):
        dec.decode_frame(vi.encode_vp8_inter_frame(W, H, _zero_mbs()))
    key, _ = _patterned_key()
    dec.decode_frame(key)
    p = vi.encode_vp8_inter_frame(W, H, _zero_mbs())
    with pytest.raises(ValueError):
        dec.decode_frame(p[:4])
    # bit flips decode or raise ValueError, never crash
    for pos in (1, 5, 9, 15, 25):
        broken = bytearray(p)
        broken[pos % len(p)] ^= 0x2A
        try:
            dec2 = vi.Vp8SequenceDecoder()
            dec2.decode_frame(key)
            dec2.decode_frame(bytes(broken))
        except (ValueError, IndexError):
            pass


def test_decode_vp8_sequence_convenience():
    key, _ = _patterned_key()
    frames = vi.decode_vp8_sequence(
        [key, vi.encode_vp8_inter_frame(W, H, _zero_mbs())])
    assert len(frames) == 2
    assert np.array_equal(frames[0], frames[1])
