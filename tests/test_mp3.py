"""MPEG-1/2 Layer III decode — kernels/mp3.

Pinning strategy (same as the image codecs): the in-repo encoder
shares tables with the decoder for bitstream round trips; the
reconstruction math is pinned against direct-formula independent
models in this file; and the committed REAL LAME-encoded golden
(tests/fixtures/silence.mp3, from the gsutil public test corpus —
45 MPEG-2 LSF mono frames of digital silence) has an EXACT expected
output regardless of filterbank approximations, because silence is a
fixed point of every linear stage."""

from __future__ import annotations

import numpy as np
import pytest

from ragflow_ocr_spark.kernels import mp3

FIXTURES = __file__.rsplit("/", 1)[0] + "/fixtures"


def test_huffman_tables_complete():
    # import-time _check_complete already ran; re-assert shape here so
    # a table edit that bypasses the check still fails a test
    for tid, (x, hl, hc, lb) in mp3._HUFF_PAIR.items():
        assert len(hl) == len(hc) == x * x, tid
        assert sum(1.0 / (1 << h) for h in hl) == 1.0, tid
    assert sum(1.0 / (1 << h) for h in mp3._COUNT1_A_HLEN) == 1.0
    assert sum(1.0 / (1 << h) for h in mp3._COUNT1_B_HLEN) == 1.0


@pytest.mark.parametrize("mpeg1", [True, False])
def test_silence_decodes_to_exact_zero(mpeg1):
    data = mp3.encode_mp3_silence(4, mpeg1=mpeg1)
    pcm, sr = mp3.decode_mp3(data)
    assert sr == (44100 if mpeg1 else 22050)
    assert len(pcm) == 4 * (1152 if mpeg1 else 576)
    assert float(np.abs(pcm).max()) == 0.0


def test_real_lame_golden_decodes_to_exact_silence():
    """Real libmp3lame output (MPEG-2 LSF, 22.05 kHz mono, 64 kbps,
    ID3v2 header, active bit reservoir): 45 frames, all-zero spectrum.
    Pins the ID3 skip, LSF header/side-info layout, reservoir
    bookkeeping, and the zero fixed point of the whole chain."""
    data = open(f"{FIXTURES}/silence.mp3", "rb").read()
    pcm, sr = mp3.decode_mp3(data)
    assert sr == 22050
    assert len(pcm) == 45 * 576
    assert float(np.abs(pcm).max()) == 0.0


def test_pm1_spectrum_matches_direct_formula_model():
    """±1 spectrum at global_gain 210 requantizes to itself; the
    decoded PCM must equal an independent direct-formula IMDCT +
    synthesis of the same spectrum (alias reduction + frequency
    inversion included)."""
    rng = np.random.RandomState(8)
    vals = np.zeros(576, int)
    pos = rng.choice(200, size=24, replace=False)
    vals[pos] = rng.choice([-1, 1], size=24)
    data = mp3.encode_mp3_pm1(list(vals), n_frames=1)
    pcm, _sr = mp3.decode_mp3(data)
    assert len(pcm) == 1152

    xr = vals.astype(np.float64).copy()
    cs, ca = mp3._ALIAS_CS, mp3._ALIAS_CA
    for sb in range(1, 32):
        for i in range(8):
            a, b = xr[sb * 18 - 1 - i], xr[sb * 18 + i]
            xr[sb * 18 - 1 - i] = a * cs[i] - b * ca[i]
            xr[sb * 18 + i] = b * cs[i] + a * ca[i]
    S = np.zeros((32, 36))
    for sb in range(32):
        for i in range(36):
            S[sb, i] = sum(
                xr[sb * 18 + k]
                * np.cos(np.pi / 72 * (2 * i + 1 + 18) * (2 * k + 1))
                for k in range(18))
        S[sb] *= np.sin(np.pi / 36 * (np.arange(36) + 0.5))
    sub = S[:, :18].copy()
    sub[1::2, 1::2] = -sub[1::2, 1::2]
    synth = mp3._Synth()
    expected = synth.run(sub)
    assert np.allclose(pcm[:576], expected, atol=1e-12)
    # granule 1 is coded silent but carries granule 0's overlap tail
    assert float(np.abs(pcm[576:]).max()) > 0.0


def test_count1_sign_and_quad_round_trip():
    vals = [0] * 576
    vals[0], vals[1], vals[2], vals[3] = 1, -1, 1, -1
    vals[8], vals[11] = -1, 1
    data = mp3.encode_mp3_pm1(vals, n_frames=2)
    pcm, _ = mp3.decode_mp3(data)
    assert len(pcm) == 2 * 1152
    assert float(np.abs(pcm).max()) > 0.0


def test_unverified_huffman_table_is_named_error():
    """A stream selecting a non-bundled big-value table must become a
    loud per-row error, not silent garbage."""
    data = bytearray(mp3.encode_mp3_silence(1, mpeg1=True))
    # side info starts at byte 4; granule 0 fields: part2_3(12),
    # big_values(9) ... force big_values>0 and table_select region0=7
    # by hand-crafting a fresh frame instead:
    bw = mp3._BitWriter()
    bw.write(0, 9); bw.write(0, 5); bw.write(0, 4)
    for gr in range(2):
        bw.write(40 if gr == 0 else 0, 12)   # part2_3_length
        bw.write(4 if gr == 0 else 0, 9)     # big_values
        bw.write(210, 8)
        bw.write(0, 4)
        bw.write(0, 1)
        bw.write(7, 5); bw.write(0, 5); bw.write(0, 5)  # table 7 (unbundled)
        bw.write(0, 4); bw.write(0, 3)
        bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    side = bw.tobytes(17)
    frame = bytearray(data[:4]) + side + bytes(417 - 4 - 17)
    with pytest.raises(ValueError, match="not bundled"):
        mp3.decode_mp3(bytes(frame))


def test_error_paths():
    with pytest.raises(ValueError):
        mp3.decode_mp3(b"")
    with pytest.raises(ValueError):
        mp3.decode_mp3(b"\x00" * 100)
    with pytest.raises(ValueError):
        mp3.decode_mp3(b"x" * (mp3.MP3_MAX_BYTES + 1))
    # truncated real golden: either decodes fewer frames or raises
    data = open(f"{FIXTURES}/silence.mp3", "rb").read()
    try:
        pcm, _ = mp3.decode_mp3(data[: len(data) // 2])
        assert len(pcm) < 45 * 576
    except ValueError:
        pass


def test_mutated_golden_never_crashes():
    data = open(f"{FIXTURES}/silence.mp3", "rb").read()
    for pos in (40, 100, 300, 700, 2000, 5000):
        broken = bytearray(data)
        broken[pos % len(data)] ^= 0x5A
        try:
            mp3.decode_mp3(bytes(broken))
        except ValueError:
            pass


def test_implied_region_split_for_window_switching():
    # libmad III_sideinfo: 8 implied bands for start/stop and mixed
    # granules, 9 for non-mixed short; dist10's constant 36 is only
    # right at MPEG-1 rates.
    f = mp3._region1_start_switched
    for sr in (44100, 48000, 32000):            # MPEG-1
        assert f(1, 0, sr) == 36                # start
        assert f(3, 0, sr) == 36                # stop
        assert f(2, 1, sr) == 36                # mixed short
        assert f(2, 0, sr) == mp3.SFB_SHORT[sr][3] * 3
    for sr in (22050, 24000, 16000, 11025, 12000):  # LSF
        assert f(1, 0, sr) == 54
        assert f(3, 0, sr) == 54
        s = mp3.SFB_SHORT[sr]
        assert f(2, 1, sr) == 36 + 2 * (s[4] - s[3])
        assert f(2, 0, sr) == s[3] * 3
    assert f(1, 0, 8000) == 108                 # MPEG-2.5 8 kHz


def test_big_values_over_spec_limit_is_loud():
    # a hostile frame can declare big_values up to 1022 and drive the
    # spectrum write past 576 samples — must be the module's
    # ValueError, not a numpy IndexError
    from ragflow_ocr_spark.kernels.mp3 import (_Bits, _Granule,
                                               _decode_spectrum)
    g = _Granule()
    g.part2_3_length = 0
    g.big_values = 511
    g.global_gain = 210
    g.window_switching = 0
    g.block_type = 0
    g.mixed_block = 0
    g.table_select = [1, 1, 1]
    g.subblock_gain = [0, 0, 0]
    g.region0_count = 0
    g.region1_count = 0
    g.preflag = 0
    g.scalefac_scale = 0
    g.count1table_select = 0
    g.scalefac_l = [0] * 23
    g.scalefac_s = [[0] * 13 for _ in range(3)]
    with pytest.raises(ValueError, match="big_values"):
        _decode_spectrum(_Bits(b"\x00" * 600), g, 44100, 0)
