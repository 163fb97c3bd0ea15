"""Arithmetic-coded JPEG entropy layer (ITU T.81 Annexes D and F).

Sequential DCT with arithmetic coding (SOF9) shares everything with
baseline JPEG except the entropy coder: instead of Huffman codes, a
binary QM arithmetic coder with an adaptive 113-state probability
estimation machine codes a tree of binary decisions per coefficient
(zero/nonzero, sign, log2 magnitude category, magnitude bits), with
conditioning contexts selected by the previous DC difference (DC) and
the coefficient index (AC). kernels/imgcodecs.py dispatches SOF9
scans here and supplies the shared DCT/quantization machinery.

The state-transition table QM_TABLE is public spec data (T.81 Table
D.3: Qe value, next-index-after-LPS/MPS, MPS-switch flag per state);
tests/test_jpeg_arith.py pins the transcription byte-for-byte against
the system libjpeg's exported `jpeg_aritab` when the library is
present, and the encoder's output is cross-validated through the
system decoder (gdk-pixbuf/libjpeg) in the same test file — the same
validation tier as the libwebp/libpng cross-checks.

Decision-tree statistics bins follow the spec layout (Table F.4): DC
uses 64 bins per table (contexts 0/4/8/12/16 of four decisions each,
then X/M magnitude areas from bin 20); AC uses 256 bins per table
(3 bins per coefficient index, X areas at 189/217 split by the Kx
conditioning bound, M areas 14 past the X position). Conditioning
bounds (DC L/U, AC Kx) come from the DAC marker; defaults 0/1/5.

Error contract: ValueError on malformed input (via imgcodecs'
_codec_errors wrapper at the decode_jpeg boundary).

Reference behavior: /root/reference/ocr/operators.py:41-46 accepts
any payload cv2/libjpeg understands, which includes SOF9;
SURVEY.md §2.3 S3 / PARITY.md S3 exotica seam.
"""

from __future__ import annotations

import numpy as np

# T.81 Table D.3: (Qe, next-state after LPS, next-state after MPS,
# switch-MPS flag). State 113 is the non-adapting "fixed 0.5" bin
# used for AC sign decisions.
QM_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
)

FIXED_BIN = 113  # non-adapting equiprobable state

_MAX_DECISIONS_PER_BLOCK = 4096  # decision-count backstop per 8x8 block


class QMDecoder:
    """T.81 F.2 binary arithmetic decoder over one scan's byte span.

    State bins are single bytes: bit 7 = current MPS sense, bits 0-6 =
    probability-estimation state index. A marker (or end of data) in
    the scan is legal mid-decode: zero bytes are supplied until the
    MCU loop completes, and the marker position is reported back."""

    __slots__ = ("data", "pos", "end", "c", "a", "ct", "marker_pos")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.end = len(data)
        self.marker_pos = None  # byte offset of the 0xFF of a marker
        self.c = 0
        self.a = 0
        self.ct = -16  # forces two initial byte fetches

    def _byte_in(self) -> int:
        if self.marker_pos is not None:
            return 0  # feed zeros after a marker / end of data
        if self.pos >= self.end:
            self.marker_pos = self.pos
            return 0
        b = self.data[self.pos]
        self.pos += 1
        if b != 0xFF:
            return b
        # 0xFF: stuffed zero byte means a literal 0xFF; anything else
        # is a marker — stop consuming and feed zeros from here on
        nxt = self.data[self.pos] if self.pos < self.end else None
        if nxt == 0x00:
            self.pos += 1
            return 0xFF
        self.marker_pos = self.pos - 1
        return 0

    def decode(self, st: bytearray, i: int) -> int:
        # renormalization + byte feed (lazy-C formulation: C holds raw
        # bytes, ct tracks the shift needed to align A against it)
        a = self.a
        while a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = ((self.c << 8) | self._byte_in()) & 0xFFFFFFFFFF
                self.ct += 8
                if self.ct < 0:
                    self.ct += 1
                    if self.ct == 0:
                        a = 0x8000  # two initial bytes loaded
            a <<= 1
        sv = st[i]
        qe, nl, nm, sw = QM_TABLE[sv & 0x7F]
        a -= qe
        temp = a << self.ct
        if self.c < temp:
            # MPS sub-interval
            if a < 0x8000:
                if a < qe:  # conditional exchange: the symbol is LPS
                    st[i] = (sv & 0x80) ^ ((sw << 7) | nl)
                    sv ^= 0x80
                else:
                    st[i] = (sv & 0x80) | nm
        else:
            self.c -= temp
            if a < qe:  # conditional exchange: the symbol is MPS
                st[i] = (sv & 0x80) | nm
            else:
                st[i] = (sv & 0x80) ^ ((sw << 7) | nl)
                sv ^= 0x80
            a = qe
        self.a = a
        return sv >> 7

    def consumed(self) -> int:
        """Bytes of scan data consumed (up to a marker if one was hit)."""
        return (self.marker_pos if self.marker_pos is not None else self.pos)


class QMEncoder:
    """T.81 D.1 binary arithmetic encoder (carry via 0xFF stacking,
    trailing zero suppression, 0xFF00 byte stuffing)."""

    __slots__ = ("out", "c", "a", "ct", "buffer", "sc", "zc")

    def __init__(self):
        self.out = bytearray()
        self.c = 0
        self.a = 0x10000
        self.ct = 11
        self.buffer = -1  # pending byte (-1: none yet)
        self.sc = 0       # stacked 0xFF-candidate bytes
        self.zc = 0       # pending zero bytes (suppressed if trailing)

    def _emit(self, b: int):
        self.out.append(b)

    def _byte_out(self):
        temp = self.c >> 19
        if temp > 0xFF:
            # carry propagates into the pending byte and turns the
            # stacked 0xFF bytes into zeros
            if self.buffer >= 0:
                if self.zc:
                    self.out += b"\x00" * self.zc
                    self.zc = 0
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)
            self.zc += self.sc
            self.sc = 0
            self.buffer = temp & 0xFF
        elif temp == 0xFF:
            self.sc += 1  # might still be hit by a carry
        else:
            # stacked bytes can no longer overflow: flush them
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                if self.zc:
                    self.out += b"\x00" * self.zc
                    self.zc = 0
                self._emit(self.buffer)
            if self.sc:
                if self.zc:
                    self.out += b"\x00" * self.zc
                    self.zc = 0
                self.out += b"\xff\x00" * self.sc
                self.sc = 0
            self.buffer = temp
        self.c &= 0x7FFFF
        self.ct += 8

    def _renorm(self):
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()

    def encode(self, st: bytearray, i: int, bit: int):
        sv = st[i]
        qe, nl, nm, sw = QM_TABLE[sv & 0x7F]
        self.a -= qe
        if bit != (sv >> 7):
            # LPS: gets the bottom subinterval unless conditional
            # exchange gives it the (larger) top one
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            st[i] = (sv & 0x80) ^ ((sw << 7) | nl)
            self._renorm()
        else:
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[i] = (sv & 0x80) | nm
            self._renorm()

    def flush(self) -> bytes:
        """Terminate (T.81 D.1.8): pick the in-interval code value
        with the most trailing zeros, emit remaining bytes, suppress
        trailing zeros (the EOI marker implies them)."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        if temp < self.c:
            self.c = temp + 0x8000
        else:
            self.c = temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # final carry
            if self.buffer >= 0:
                if self.zc:
                    self.out += b"\x00" * self.zc
                    self.zc = 0
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                if self.zc:
                    self.out += b"\x00" * self.zc
                    self.zc = 0
                self._emit(self.buffer)
            if self.sc:
                if self.zc:
                    self.out += b"\x00" * self.zc
                    self.zc = 0
                self.out += b"\xff\x00" * self.sc
                self.sc = 0
        # last two code bytes, only if nonzero (trailing-zero rule)
        if self.c & 0x7FFF800:
            if self.zc:
                self.out += b"\x00" * self.zc
                self.zc = 0
            b = (self.c >> 19) & 0xFF
            self._emit(b)
            if b == 0xFF:
                self._emit(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self._emit(b)
                if b == 0xFF:
                    self._emit(0x00)
        return bytes(self.out)


# --------------------------------------------------------------- scans
#
# Statistics layout per T.81 Table F.4. DC (64 bins per table):
# contexts at 0/4/8/12/16 (zero / small± / large± previous diff),
# each holding S0, SS, SP, SN; X (category) area from bin 20; M
# (magnitude bits) area 14 past the X position. AC (256 bins per
# table): S0/SS-equivalent at 3*(k-1), X areas at 189 (k <= Kx) and
# 217, M areas 14 past.


def decode_sequential_scan(
    data: bytes,
    pos: int,
    scan_comps: list[dict],
    mcus_x: int,
    mcus_y: int,
    dc_cond: dict[int, tuple[int, int]],
    ac_cond: dict[int, int],
) -> int:
    """Arithmetic sequential interleaved scan → fills each comp's
    ``coefs`` (natural-raster (by, bx, 64) zigzag-indexed layout, the
    same contract as the Huffman scans). Returns bytes consumed."""
    dec = QMDecoder(data, pos)
    dc_stats: dict[int, bytearray] = {}
    ac_stats: dict[int, bytearray] = {}
    fixed = bytearray([FIXED_BIN])
    for c in scan_comps:
        dc_stats.setdefault(c["dc_tbl_a"], bytearray(64))
        ac_stats.setdefault(c["ac_tbl_a"], bytearray(256))
        c["_dc_context"] = 0
        c["_last_dc"] = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in scan_comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["coefs"][my * c["v"] + by, mx * c["h"] + bx]
                        _decode_block(
                            dec, c, blk, dc_stats, ac_stats, fixed,
                            dc_cond, ac_cond,
                        )
    return dec.consumed() - pos


def _decode_block(dec, c, blk, dc_stats, ac_stats, fixed,
                  dc_cond, ac_cond):
    budget = _MAX_DECISIONS_PER_BLOCK
    # ---- DC (T.81 F.2.4.1)
    tbl = c["dc_tbl_a"]
    st = dc_stats[tbl]
    L, U = dc_cond.get(tbl, (0, 1))
    s0 = c["_dc_context"]
    if dec.decode(st, s0) == 0:
        c["_dc_context"] = 0
    else:
        sign = dec.decode(st, s0 + 1)
        base = s0 + 2 + sign
        m = dec.decode(st, base)
        xpos = base
        if m:
            xpos = 20
            while dec.decode(st, xpos):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arith JPEG DC magnitude overflow")
                xpos += 1
        if m < (1 << L) >> 1:
            c["_dc_context"] = 0
        elif m > (1 << U) >> 1:
            c["_dc_context"] = 12 + sign * 4
        else:
            c["_dc_context"] = 4 + sign * 4
        v = m
        mpos = xpos + 14
        while m := m >> 1:
            budget -= 1
            if budget < 0:
                raise ValueError("arith JPEG decision budget exceeded")
            if dec.decode(st, mpos):
                v |= m
        v += 1
        c["_last_dc"] += -v if sign else v
    blk[0] = c["_last_dc"]
    # ---- AC (T.81 F.2.4.2), Se = 63 for sequential
    tbl = c["ac_tbl_a"]
    st = ac_stats[tbl]
    kx = ac_cond.get(tbl, 5)
    k = 1
    while k <= 63:
        s0 = 3 * (k - 1)
        if dec.decode(st, s0):
            break  # EOB
        while dec.decode(st, s0 + 1) == 0:
            s0 += 3
            k += 1
            if k > 63:
                raise ValueError("arith JPEG AC index overflow")
        sign = dec.decode(fixed, 0)
        base = s0 + 2
        m = dec.decode(st, base)
        xpos = base
        if m:
            if dec.decode(st, base):
                m = 2
                xpos = 189 if k <= kx else 217
                while dec.decode(st, xpos):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arith JPEG AC magnitude overflow")
                    xpos += 1
        v = m
        mpos = xpos + 14
        while m := m >> 1:
            budget -= 1
            if budget < 0:
                raise ValueError("arith JPEG decision budget exceeded")
            if dec.decode(st, mpos):
                v |= m
        v += 1
        blk[k] = -v if sign else v  # coefs layout is zigzag-indexed
        k += 1


def encode_sequential_scan(
    blocks_per_comp: list[np.ndarray],
    comps_meta: list[dict],
    mcus_x: int,
    mcus_y: int,
    dc_cond: dict[int, tuple[int, int]],
    ac_cond: dict[int, int],
) -> bytes:
    """Arithmetic sequential interleaved scan from quantized zigzag
    blocks. blocks_per_comp[ci] has shape (mcus_y*v, mcus_x*h, 64) in
    zigzag order (the decode-side coefs layout); comps_meta[ci] = {"h","v","dc_tbl_a","ac_tbl_a"}."""
    enc = QMEncoder()
    dc_stats: dict[int, bytearray] = {}
    ac_stats: dict[int, bytearray] = {}
    fixed = bytearray([FIXED_BIN])
    state = []
    for meta in comps_meta:
        dc_stats.setdefault(meta["dc_tbl_a"], bytearray(64))
        ac_stats.setdefault(meta["ac_tbl_a"], bytearray(256))
        state.append({"ctx": 0, "last": 0})
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, meta in enumerate(comps_meta):
                for by in range(meta["v"]):
                    for bx in range(meta["h"]):
                        zz = blocks_per_comp[ci][
                            my * meta["v"] + by, mx * meta["h"] + bx
                        ]
                        _encode_block(
                            enc, meta, state[ci], zz,
                            dc_stats, ac_stats, fixed, dc_cond, ac_cond,
                        )
    return enc.flush()


def _encode_block(enc, meta, stt, zz, dc_stats, ac_stats, fixed,
                  dc_cond, ac_cond):
    # ---- DC (T.81 F.1.4.1)
    tbl = meta["dc_tbl_a"]
    st = dc_stats[tbl]
    L, U = dc_cond.get(tbl, (0, 1))
    s0 = stt["ctx"]
    diff = int(zz[0]) - stt["last"]
    stt["last"] = int(zz[0])
    if diff == 0:
        enc.encode(st, s0, 0)
        stt["ctx"] = 0
    else:
        enc.encode(st, s0, 1)
        if diff > 0:
            enc.encode(st, s0 + 1, 0)
            sign = 0
        else:
            enc.encode(st, s0 + 1, 1)
            sign = 1
            diff = -diff
        base = s0 + 2 + sign
        v = diff - 1
        m = 0
        xpos = base
        if v:
            enc.encode(st, base, 1)
            m = 1
            xpos = 20
            v2 = v
            while v2 := v2 >> 1:
                enc.encode(st, xpos, 1)
                m <<= 1
                xpos += 1
        enc.encode(st, xpos, 0)
        if m < (1 << L) >> 1:
            stt["ctx"] = 0
        elif m > (1 << U) >> 1:
            stt["ctx"] = 12 + sign * 4
        else:
            stt["ctx"] = 4 + sign * 4
        mpos = xpos + 14
        while m := m >> 1:
            enc.encode(st, mpos, 1 if (m & v) else 0)
    # ---- AC (T.81 F.1.4.2)
    tbl = meta["ac_tbl_a"]
    st = ac_stats[tbl]
    kx = ac_cond.get(tbl, 5)
    ke = 63
    while ke > 0 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        s0 = 3 * (k - 1)
        enc.encode(st, s0, 0)  # not EOB
        while int(zz[k]) == 0:
            enc.encode(st, s0 + 1, 0)
            s0 += 3
            k += 1
        enc.encode(st, s0 + 1, 1)
        v = int(zz[k])
        if v > 0:
            enc.encode(fixed, 0, 0)
            sign = 0
        else:
            enc.encode(fixed, 0, 1)
            sign = 1
            v = -v
        base = s0 + 2
        v -= 1
        m = 0
        xpos = base
        if v:
            enc.encode(st, base, 1)
            m = 1
            if v >> 1:
                enc.encode(st, base, 1)
                m = 2
                xpos = 189 if k <= kx else 217
                v2 = v >> 1
                while v2 := v2 >> 1:
                    enc.encode(st, xpos, 1)
                    m <<= 1
                    xpos += 1
        enc.encode(st, xpos, 0)
        mpos = xpos + 14
        while m := m >> 1:
            enc.encode(st, mpos, 1 if (m & v) else 0)
        k += 1
    if k <= 63:
        enc.encode(st, 3 * (k - 1), 1)  # EOB
