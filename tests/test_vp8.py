"""VP8 (lossy WebP) codec tests — kernels/vp8.

Strategy mirrors the repo's other from-scratch codecs: the bitstream
layer (bool coder, trees, contexts, headers, token coding) is pinned
by encode→decode round trips against the encoder's independently
assembled expected reconstruction; the transform/prediction layer is
pinned by hand-computed values and scalar transcriptions of the RFC
6386 pseudo-code (different code shape than the vectorized kernels).
Reference parity target: cv2.imdecode accepting lossy WebP at
/root/reference/ocr/operators.py:41-46.
"""

import numpy as np
import pytest

from ragflow_ocr_spark.kernels import vp8, webp


# ---------------------------------------------------------------- transforms


def _idct_scalar(block):
    """Scalar transcription of RFC 6386 §14.4 (independent of the
    vectorized kernel)."""
    ip = [int(v) for v in block]
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * 35468) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * 20091) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * 20091) >> 16)
        t2 = (ip[12 + i] * 35468) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        o = i * 4
        a1 = tmp[o] + tmp[o + 2]
        b1 = tmp[o] - tmp[o + 2]
        t1 = (tmp[o + 1] * 35468) >> 16
        t2 = tmp[o + 3] + ((tmp[o + 3] * 20091) >> 16)
        c1 = t1 - t2
        t1 = tmp[o + 1] + ((tmp[o + 1] * 20091) >> 16)
        t2 = (tmp[o + 3] * 35468) >> 16
        d1 = t1 + t2
        out[o] = (a1 + d1 + 4) >> 3
        out[o + 3] = (a1 - d1 + 4) >> 3
        out[o + 1] = (b1 + c1 + 4) >> 3
        out[o + 2] = (b1 - c1 + 4) >> 3
    return np.array(out).reshape(4, 4)


def _iwht_scalar(block):
    ip = [int(v) for v in block]
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        o = i * 4
        a1 = tmp[o] + tmp[o + 3]
        b1 = tmp[o + 1] + tmp[o + 2]
        c1 = tmp[o + 1] - tmp[o + 2]
        d1 = tmp[o] - tmp[o + 3]
        out[o] = (a1 + b1 + 3) >> 3
        out[o + 1] = (c1 + d1 + 3) >> 3
        out[o + 2] = (a1 - b1 + 3) >> 3
        out[o + 3] = (d1 - c1 + 3) >> 3
    return np.array(out)


def test_idct_dc_only():
    b = np.zeros(16, np.int64)
    b[0] = 100
    assert (vp8.idct4x4(b) == (100 + 4) >> 3).all()
    b[0] = -100
    assert (vp8.idct4x4(b) == (-100 + 4) >> 3).all()  # floor shift


def test_idct_matches_scalar_transcription():
    rng = np.random.RandomState(3)
    for _ in range(50):
        b = rng.randint(-2048, 2048, 16).astype(np.int64)
        assert (vp8.idct4x4(b) == _idct_scalar(b)).all()


def test_iwht_matches_scalar_transcription():
    rng = np.random.RandomState(4)
    for _ in range(50):
        b = rng.randint(-2048, 2048, 16).astype(np.int64)
        assert (vp8.iwht4x4(b) == _iwht_scalar(b)).all()


# ---------------------------------------------------------------- bool coder


def test_bool_coder_round_trip():
    rng = np.random.RandomState(5)
    probs = rng.randint(1, 255, 2000)
    bits = rng.randint(0, 2, 2000)
    be = vp8.BoolEncoder()
    for p, v in zip(probs, bits):
        be.write_bool(int(p), int(v))
    data = be.finish()
    bd = vp8.BoolDecoder(data)
    for p, v in zip(probs, bits):
        assert bd.read_bool(int(p)) == v


def test_bool_coder_literals_and_trees():
    be = vp8.BoolEncoder()
    be.write_literal(0x5A, 7)
    be.write_tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB, vp8.B_PRED)
    be.write_tree(vp8.COEFF_TREE, vp8.DEFAULT_COEFF_PROBS[0][1][2],
                  vp8.CAT3, 2)  # start=2: the post-zero no-EOB entry
    be.write_signed(-9, 5)
    data = be.finish()
    bd = vp8.BoolDecoder(data)
    assert bd.read_literal(7) == 0x5A
    assert bd.read_tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB) == vp8.B_PRED
    assert bd.read_tree(vp8.COEFF_TREE, vp8.DEFAULT_COEFF_PROBS[0][1][2],
                        2) == vp8.CAT3
    assert bd.read_signed(5) == -9


# -------------------------------------------------------- border conventions


def _decode_luma_gray(payload):
    img = vp8.decode_vp8(payload)
    assert img.ndim == 2  # flat frames collapse to gray
    return img


def test_top_border_is_127_via_v_pred():
    # V_PRED at the frame top copies the off-frame 127 row; with u=v
    # untouched (128) the gray output is the BT.601 map of 127.
    payload, _ = vp8.encode_vp8_frame(
        16, 16, [{"ymode": vp8.V_PRED, "uvmode": vp8.DC_PRED}])
    g = (298 * (127 - 16) + 128) >> 8
    assert (_decode_luma_gray(payload) == g).all()


def test_left_border_is_129_via_h_pred():
    payload, _ = vp8.encode_vp8_frame(
        16, 16, [{"ymode": vp8.H_PRED, "uvmode": vp8.DC_PRED}])
    g = (298 * (129 - 16) + 128) >> 8
    assert (_decode_luma_gray(payload) == g).all()


def test_dc_no_neighbors_is_128():
    payload, _ = vp8.encode_vp8_frame(
        16, 16, [{"ymode": vp8.DC_PRED, "uvmode": vp8.DC_PRED}])
    g = (298 * (128 - 16) + 128) >> 8
    assert (_decode_luma_gray(payload) == g).all()


def test_tm_uses_corner():
    # TM at (0,0): clip(129 + 127 - 127) = 129 everywhere
    payload, _ = vp8.encode_vp8_frame(
        16, 16, [{"ymode": vp8.TM_PRED, "uvmode": vp8.DC_PRED}])
    g = (298 * (129 - 16) + 128) >> 8
    assert (_decode_luma_gray(payload) == g).all()


# ------------------------------------------------------------- flat exactness


@pytest.mark.parametrize("y", [64, 81, 128, 145, 191])
def test_flat_lossy_webp_is_exactly_lossless(y):
    data = vp8.encode_webp_lossy_flat(64, 48, (y, 128, 128))
    img = webp.decode_webp(data)
    g = (298 * (y - 16) + 128) >> 8
    assert img.shape == (48, 64)
    assert (img == g).all()


def test_flat_color_lossy_webp():
    data = vp8.encode_webp_lossy_flat(32, 32, (100, 90, 170))
    img = webp.decode_webp(data)
    assert img.shape == (32, 32, 3)
    c = 298 * (100 - 16)
    assert (img[..., 0] == min(255, max(0, (c + 409 * 42 + 128) >> 8))).all()
    assert (img[..., 1] == min(255, max(0, (c - 100 * -38 - 208 * 42
                                            + 128) >> 8))).all()
    assert (img[..., 2] == min(255, max(0, (c + 516 * -38 + 128) >> 8))).all()


# ------------------------------------------------------------ round-trip fuzz


def _rand_mb(rng, allow_b=True):
    if allow_b and rng.rand() < 0.4:
        spec = {"ymode": vp8.B_PRED, "uvmode": int(rng.randint(0, 4)),
                "bmodes": [int(rng.randint(0, 10)) for _ in range(16)]}
    else:
        spec = {"ymode": int(rng.randint(0, 4)),
                "uvmode": int(rng.randint(0, 4))}
        if rng.rand() < 0.5:
            spec["y2"] = [int(v) for v in
                          rng.randint(-80, 80, 16) * (rng.rand(16) < 0.3)]
    if rng.rand() < 0.7:
        spec["y"] = [[int(v) for v in
                      rng.randint(-900, 900, 16) * (rng.rand(16) < 0.25)]
                     for _ in range(16)]
    if rng.rand() < 0.5:
        for k in ("u", "v"):
            spec[k] = [[int(v) for v in
                        rng.randint(-40, 40, 16) * (rng.rand(16) < 0.2)]
                       for _ in range(4)]
    return spec


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_round_trip_fuzz(seed):
    rng = np.random.RandomState(seed)
    for _ in range(4):
        w = int(rng.randint(17, 80))
        h = int(rng.randint(17, 70))
        mbr, mbc = (h + 15) // 16, (w + 15) // 16
        q = int(rng.randint(0, 128))
        fl = int(rng.choice([0, 0, 10, 33, 63]))
        ft = int(rng.choice([0, 0, 1]))
        mbs = [_rand_mb(rng) for _ in range(mbr * mbc)]
        payload, expected = vp8.encode_vp8_frame(
            w, h, mbs, q_index=q, filter_level=fl, filter_type=ft)
        got = vp8.decode_vp8(payload)
        assert got.shape == expected.shape
        assert (got == expected).all(), (w, h, q, fl, ft)


def test_cat6_extreme_coefficients_round_trip():
    y = [[0] * 16 for _ in range(16)]
    y[0] = [2114, -2114, 67, -67] + [0] * 12  # cat6 bounds
    payload, expected = vp8.encode_vp8_frame(
        16, 16, [{"ymode": vp8.DC_PRED, "uvmode": vp8.DC_PRED, "y": y}],
        q_index=127)
    assert (vp8.decode_vp8(payload) == expected).all()


def test_skip_context_reset_round_trip():
    # alternating coeff-bearing and skip MBs exercises the context
    # reset rule (Y2 context reset only for non-B_PRED skips)
    rng = np.random.RandomState(11)
    mbs = []
    for i in range(4 * 3):
        if i % 2:
            mbs.append({"ymode": vp8.DC_PRED, "uvmode": vp8.DC_PRED})
        else:
            mbs.append(_rand_mb(rng))
    payload, expected = vp8.encode_vp8_frame(64, 48, mbs, q_index=10)
    assert (vp8.decode_vp8(payload) == expected).all()


# ----------------------------------------------------------------- containers


def test_decode_webp_routes_vp8():
    data = vp8.encode_webp_lossy_flat(32, 16, (150, 128, 128))
    img = webp.decode_webp(data)
    g = (298 * (150 - 16) + 128) >> 8
    assert (img == g).all()


def test_error_paths():
    with pytest.raises(ValueError):
        vp8.decode_vp8(b"\x00" * 4)  # truncated
    payload, _ = vp8.encode_vp8_frame(
        16, 16, [{"ymode": vp8.DC_PRED, "uvmode": vp8.DC_PRED}])
    with pytest.raises(ValueError):
        vp8.decode_vp8(bytes([payload[0] | 1]) + payload[1:])  # interframe
    with pytest.raises(ValueError):
        vp8.decode_vp8(payload[:3] + b"\x00\x00\x00" + payload[6:])  # magic
    # oversized dims rejected before any allocation
    big = bytearray(payload)
    big[6] = 0xFF
    big[7] = 0x3F
    big[8] = 0xFF
    big[9] = 0x3F
    with pytest.raises(ValueError):
        vp8.decode_vp8(bytes(big))


def test_truncated_stream_is_value_error_not_crash():
    data = vp8.encode_webp_lossy_flat(64, 48, (100, 128, 128))
    for cut in (24, 30, len(data) - 4):
        with pytest.raises(ValueError):
            webp.decode_webp(data[:cut])


def test_media_image_stats_lossy_family_closed_form():
    # the ops/multimodal oracle family: doc_id % 16 == 15
    for did in (15, 31, 47, 111):
        y = 64 + did % 128
        data = vp8.encode_webp_lossy_flat(64, 48, (y, 128, 128))
        img = webp.decode_webp(data)
        g = (298 * (y - 16) + 128) >> 8
        assert float(img.mean()) == float(g)
        assert float(img.std()) == 0.0


# ---------------------------------------------------------------------------
# Real-encoder golden: tests/fixtures/python_logo.webp is the CPython
# test-suite `python.webp` (Lib/test/imghdrdata, PSF-licensed), a
# libwebp-encoded VP8X still: ALPH + lossy VP8 keyframe, 16x16. It is
# the live proof that the RFC 6386 probability tables are exact — the
# round-4 reconstructed tables desynced on it (partition 0, then
# partition 1), and any wrong entry on the stream's path desyncs the
# bool decoder. Every frame header reads ALL 1056 COEFF_UPDATE_PROBS
# entries, so that table is covered in full; the mode/token path
# covers the DEFAULT_COEFF_PROBS / KF_BMODE_PROB rows it touches.
# ---------------------------------------------------------------------------

FIXTURES = __file__.rsplit("/", 1)[0] + "/fixtures"


def test_real_libwebp_golden_decodes_bit_exact():
    import hashlib

    data = open(f"{FIXTURES}/python_logo.webp", "rb").read()
    img = webp.decode_webp(data)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # pinned reconstruction (dequant + IDCT + prediction + loop filter
    # are all integer-exact, so this hash is deterministic)
    assert (
        hashlib.sha256(img.tobytes()).hexdigest()
        == "3019cd5bc085a9be489550c574a0f8e3a161ff8e9db140b9e888459745a08628"
    )
    # structural sanity: the Python logo — blue top-left, yellow
    # bottom-right (guards the hash against "stable garbage")
    tl = img[:8, :8].reshape(-1, 3).mean(axis=0)
    br = img[8:, 8:].reshape(-1, 3).mean(axis=0)
    assert tl[2] > tl[0] + 40   # TL: blue dominant
    assert br[0] > br[2] + 60   # BR: red+green (yellow) dominant


def test_real_golden_mutations_fail_loudly():
    # bit flips inside the VP8 payload must either decode (flips can
    # land in pixel data) or raise ValueError — never crash, never hang
    base = open(f"{FIXTURES}/python_logo.webp", "rb").read()
    for pos in (60, 90, 130, 200, 300, 420):
        mutated = bytearray(base)
        mutated[pos % len(base)] ^= 0x41
        try:
            img = webp.decode_webp(bytes(mutated))
            assert img.shape[-1] in (3, 16)
        except ValueError:
            pass
