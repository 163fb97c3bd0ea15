"""Pure-Python WebP **lossless** (VP8L) codec.

Narrows the multimodal ``webp → error:unsupported_codec`` seam: the
RIFF/WEBP container is parsed for real and VP8L streams decode fully —
canonical prefix codes (simple + normal with 16/17/18 run coding),
LZ77 back-references through the 120-entry 2D distance map, the color
cache, meta prefix (huffman) images, and all four transforms
(predictor, color, subtract-green, color-indexing incl. sub-byte pixel
bundling). Lossy VP8 keyframes decode via kernels/vp8 (RFC 6386
intra path — see that module's probability-table provenance note).

The encoder emits valid VP8L for fixtures: literal pixels with real
Huffman codes, optional subtract-green / fixed-mode predictor / color
transform / palette (color-indexing) forward passes, and run-length
LZ77 — so every decoder path is round-trip tested without libwebp.

Spec: "WebP Lossless Bitstream Specification" (public), mirrored by
libwebp's vp8l_dec.c. All bit packing is LSB-first.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

MAX_DECODE_PIXELS = 1 << 26  # same untrusted-payload ceiling as the others
# VP8L-specific ceiling, deliberately tighter: the entropy decode is a
# per-pixel Python loop (Huffman peek + LZ77/cache bookkeeping —
# correctness-first, ~100k px/s), so a 64 MPix image would stall a
# Spark task for minutes. 4 MPix covers typical web images; larger
# lossless WebPs become per-row errors instead of stragglers. Installs
# of onnxruntime-class native decoders can lift this at deploy time.
VP8L_MAX_PIXELS = 1 << 22


def _codec_errors(fn):
    """Same decoder boundary guard as kernels/imgcodecs: crafted input
    can surface struct/index/key errors from the tokenizer paths —
    normalize to the contractual ValueError (per-row error upstream,
    never a task failure). NotImplementedError (the lossy-VP8 seam)
    passes through for callers that distinguish it."""

    @functools.wraps(fn)
    def inner(data: bytes) -> np.ndarray:
        try:
            return fn(data)
        except (
            struct.error,
            IndexError,
            KeyError,
            ZeroDivisionError,
            OverflowError,
            RecursionError,
        ) as e:
            raise ValueError(f"malformed WebP: {e!r}") from e

    return inner

# code-length-code symbol order (spec section 6.2.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 2D neighbor offsets for distance codes 1..120 (spec section 5.2.2)
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _Bits:
    """LSB-first bit reader over bytes."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data + b"\x00" * 8  # tail slack; overrun checked via pos
        self.pos = 0
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        b = p >> 3
        w = int.from_bytes(self.data[b : b + 8], "little")
        self.pos = p + n
        if self.pos > self.nbits:
            raise ValueError("truncated VP8L stream")
        return (w >> (p & 7)) & ((1 << n) - 1)


class _Code:
    """Canonical prefix decoder: peek-table over max code length."""

    __slots__ = ("val", "ln", "bits", "single")

    def __init__(self, lengths: list[int]):
        maxlen = max(lengths) if any(lengths) else 0
        nonzero = [(ln, s) for s, ln in enumerate(lengths) if ln]
        if len(nonzero) == 1:
            # degenerate: single symbol, zero bits read
            self.single = nonzero[0][1]
            self.bits = 0
            self.val = self.ln = None
            return
        self.single = None
        # kraft check
        if sum(1 << (maxlen - ln) for ln, _ in nonzero) != 1 << maxlen:
            raise ValueError("incomplete VP8L prefix code")
        self.bits = maxlen
        size = 1 << maxlen
        val = [0] * size
        lnt = [0] * size
        code = 0
        prev_len = 0
        for ln, sym in sorted(nonzero):
            code <<= ln - prev_len  # canonical: left-shift on length change
            prev_len = ln
            # canonical code `code` of length ln, LSB-first in stream →
            # table index = bit-reversed code, repeated every 2^ln
            rev = int(f"{code:0{ln}b}"[::-1], 2)
            step = 1 << ln
            for i in range(rev, size, step):
                val[i] = sym
                lnt[i] = ln
            code += 1
        self.val = val
        self.ln = lnt

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        p = br.pos
        b = p >> 3
        w = int.from_bytes(br.data[b : b + 8], "little")
        peek = (w >> (p & 7)) & ((1 << self.bits) - 1)
        ln = self.ln[peek]
        if ln == 0:
            raise ValueError("bad VP8L prefix code")
        br.pos = p + ln
        if br.pos > br.nbits:
            raise ValueError("truncated VP8L stream")
        return self.val[peek]


def _read_code_lengths(br: _Bits, alphabet: int) -> list[int]:
    """One prefix code, simple or normal form → per-symbol lengths."""
    if br.read(1):  # simple
        num = br.read(1) + 1
        first_8 = br.read(1)
        lengths = [0] * alphabet
        s0 = br.read(8 if first_8 else 1)
        if s0 >= alphabet:
            raise ValueError("VP8L simple-code symbol out of range")
        if num == 1:
            lengths[s0] = 1
        else:
            s1 = br.read(8)
            if s1 >= alphabet or s1 == s0:
                raise ValueError("VP8L simple-code symbols invalid")
            lengths[s0] = lengths[s1] = 1
        return lengths
    # normal: code-length code first
    n_clc = 4 + br.read(4)
    clc_len = [0] * 19
    for i in range(n_clc):
        clc_len[_CLC_ORDER[i]] = br.read(3)
    clc = _Code(clc_len)
    # optional cap on decoded symbols
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        sym = clc.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            lengths[i : i + rep] = [prev] * rep
            i += rep
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
        if i > alphabet:
            raise ValueError("VP8L code-length overflow")
    return lengths


def _lz77_value(br: _Bits, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


class _Group:
    __slots__ = ("g", "r", "b", "a", "d")

    def __init__(self, br: _Bits, cache_size: int):
        self.g = _Code(_read_code_lengths(br, 256 + 24 + cache_size))
        self.r = _Code(_read_code_lengths(br, 256))
        self.b = _Code(_read_code_lengths(br, 256))
        self.a = _Code(_read_code_lengths(br, 256))
        self.d = _Code(_read_code_lengths(br, 40))


def _decode_pixels(br: _Bits, w: int, h: int, allow_meta: bool) -> np.ndarray:
    """Spatially-coded image → (h, w, 4) uint8 ARGB-as-[a,r,g,b]."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("bad VP8L cache bits")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = 2 + br.read(3)
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_pixels(br, mw, mh, False)
        meta = (
            meta_img[..., 1].astype(np.int32) << 8
        ) | meta_img[..., 2].astype(np.int32)
        n_groups = int(meta.max()) + 1
    groups = [_Group(br, cache_size) for _ in range(n_groups)]

    out = np.zeros(w * h, dtype=np.uint32)
    n = w * h
    i = 0
    g0 = groups[0]
    while i < n:
        if meta is not None:
            y, x = divmod(i, w)
            grp = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            grp = g0
        sym = grp.g.read(br)
        if sym < 256:
            red = grp.r.read(br)
            blue = grp.b.read(br)
            alpha = grp.a.read(br)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out[i] = px
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            i += 1
        elif sym < 280:
            length = _lz77_value(br, sym - 256)
            dcode = grp.d.read(br)
            plane = _lz77_value(br, dcode)
            if plane > 120:
                dist = plane - 120
            else:
                dx, dy = _DIST_MAP[plane - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > i or i + length > n:
                raise ValueError("bad VP8L back-reference")
            for k in range(length):
                px = int(out[i - dist])
                out[i] = px
                if cache_size:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
                i += 1
        else:
            if sym - 280 >= cache_size:
                raise ValueError("VP8L cache index out of range")
            out[i] = cache[sym - 280]
            i += 1
    arr = out.reshape(h, w)
    return np.stack(
        [
            (arr >> 24).astype(np.uint8),
            (arr >> 16).astype(np.uint8),
            (arr >> 8).astype(np.uint8),
            arr.astype(np.uint8),
        ],
        axis=-1,
    )  # [a, r, g, b]


# ------------------------------------------------------- transforms (inverse)
def _inv_subtract_green(px: np.ndarray) -> None:
    g = px[..., 2]
    px[..., 1] += g
    px[..., 3] += g


def _inv_color_indexing(px: np.ndarray, palette: np.ndarray, w: int) -> np.ndarray:
    """Green channel carries (possibly bundled) palette indexes."""
    n_colors = len(palette)
    if n_colors > 16:
        ibits = 0
    elif n_colors > 4:
        ibits = 1
    elif n_colors > 2:
        ibits = 2
    else:
        ibits = 3
    idx = px[..., 2]
    if ibits:
        # unbundle: each packed byte holds 2^ibits indexes, LSB first
        per = 1 << ibits
        bw = idx.shape[1]
        sub = 8 >> ibits
        cols = np.arange(w)
        packed = idx[:, cols >> ibits]
        shifts = (cols & (per - 1)) * sub
        idx = (packed >> shifts[None, :]) & ((1 << sub) - 1)
    else:
        idx = idx[:, :w]
    if int(idx.max()) >= n_colors:
        raise ValueError("VP8L palette index out of range")
    return palette[idx]  # (h, w, 4)


def _inv_color_transform(px: np.ndarray, bits: int, data: np.ndarray) -> None:
    h, w = px.shape[:2]
    bs = 1 << bits
    for by in range((h + bs - 1) // bs):
        for bx in range((w + bs - 1) // bs):
            ys, xs = by * bs, bx * bs
            blk = px[ys : ys + bs, xs : xs + bs]
            # spec: green_to_red lives in the BLUE field, green_to_blue
            # in GREEN, red_to_blue in RED of the transform pixel; each
            # delta is int8, applied as (int8(t) * int8(c)) >> 5
            green_to_red = int(np.int8(data[by, bx, 3]))
            green_to_blue = int(np.int8(data[by, bx, 2]))
            red_to_blue = int(np.int8(data[by, bx, 1]))
            g = blk[..., 2].astype(np.int32)
            r = blk[..., 1].astype(np.int32)
            r = (r + ((green_to_red * ((g << 24) >> 24)) >> 5)) & 0xFF
            b = blk[..., 3].astype(np.int32)
            b = (b + ((green_to_blue * ((g << 24) >> 24)) >> 5)) & 0xFF
            b = (b + ((red_to_blue * ((r << 24) >> 24)) >> 5)) & 0xFF
            blk[..., 1] = r.astype(np.uint8)
            blk[..., 3] = b.astype(np.uint8)


def _inv_predictor(px: np.ndarray, bits: int, modes: np.ndarray) -> None:
    """Per-block spatial prediction, applied progressively in scan
    order (each pixel's prediction uses already-reconstructed
    neighbors). Python loop over pixels — transform subimages and real
    photos are modest in this engine's crawl path; correctness first."""
    h, w = px.shape[:2]
    p = px.astype(np.int32)

    def clamp_add_sub_full(a, b, c):
        v = a + b - c
        return min(255, max(0, v))

    def clamp_add_sub_half(a, b):
        # C-style truncation toward zero, NOT Python floor — differs
        # for negative (a - b) and is bit-visible in real files
        d = a - b
        v = a + (d // 2 if d >= 0 else -((-d) // 2))
        return min(255, max(0, v))

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)  # ARGB black, alpha 255
            elif y == 0:
                pred = tuple(p[y, x - 1])
            elif x == 0:
                pred = tuple(p[y - 1, x])
            else:
                mode = int(modes[y >> bits, x >> bits, 2])  # green field
                L = p[y, x - 1]
                T = p[y - 1, x]
                TL = p[y - 1, x - 1]
                # rightmost column: TR wraps to the CURRENT row's first
                # pixel (linear memory layout — libwebp reads top[x+1])
                TR = p[y - 1, x + 1] if x + 1 < w else p[y, 0]
                if mode == 0:
                    pred = (255, 0, 0, 0)
                elif mode == 1:
                    pred = tuple(L)
                elif mode == 2:
                    pred = tuple(T)
                elif mode == 3:
                    pred = tuple(TR)
                elif mode == 4:
                    pred = tuple(TL)
                elif mode == 5:
                    pred = tuple(
                        ((int(L[c]) + int(TR[c])) // 2 + int(T[c])) // 2
                        for c in range(4)
                    )
                elif mode == 6:
                    pred = tuple((int(L[c]) + int(TL[c])) // 2 for c in range(4))
                elif mode == 7:
                    pred = tuple((int(L[c]) + int(T[c])) // 2 for c in range(4))
                elif mode == 8:
                    pred = tuple((int(TL[c]) + int(T[c])) // 2 for c in range(4))
                elif mode == 9:
                    pred = tuple((int(T[c]) + int(TR[c])) // 2 for c in range(4))
                elif mode == 10:
                    pred = tuple(
                        (
                            (int(L[c]) + int(TL[c])) // 2
                            + (int(T[c]) + int(TR[c])) // 2
                        )
                        // 2
                        for c in range(4)
                    )
                elif mode == 11:  # Select
                    pL = sum(abs(int(T[c]) - int(TL[c])) for c in range(4))
                    pT = sum(abs(int(L[c]) - int(TL[c])) for c in range(4))
                    pred = tuple(L) if pL < pT else tuple(T)
                elif mode == 12:
                    pred = tuple(
                        clamp_add_sub_full(int(L[c]), int(T[c]), int(TL[c]))
                        for c in range(4)
                    )
                elif mode == 13:
                    pred = tuple(
                        clamp_add_sub_half(
                            (int(L[c]) + int(T[c])) // 2, int(TL[c])
                        )
                        for c in range(4)
                    )
                else:
                    raise ValueError(f"bad VP8L predictor mode {mode}")
            for c in range(4):
                p[y, x, c] = (p[y, x, c] + pred[c]) & 0xFF
    px[:] = p.astype(np.uint8)


def _read_subimage(br: _Bits, w: int, h: int) -> np.ndarray:
    return _decode_pixels(br, w, h, False)


@_codec_errors
def decode_vp8l(data: bytes) -> np.ndarray:
    """Raw VP8L payload (inside the RIFF chunk) → HxW gray / HxWx3 RGB
    (alpha dropped, cv2.IMREAD_COLOR-style)."""
    br = _Bits(data)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("bad VP8L version")
    if w * h > VP8L_MAX_PIXELS:
        raise ValueError("VP8L too large for the pure-Python decoder")

    transforms: list[tuple] = []
    seen = set()
    xsize = w  # color-indexing shrinks the coded width
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = 2 + br.read(3)
            bw = (xsize + (1 << bits) - 1) >> bits
            bh = (h + (1 << bits) - 1) >> bits
            transforms.append(("pred", bits, _read_subimage(br, bw, bh)))
        elif ttype == 1:  # color transform
            bits = 2 + br.read(3)
            bw = (xsize + (1 << bits) - 1) >> bits
            bh = (h + (1 << bits) - 1) >> bits
            transforms.append(("color", bits, _read_subimage(br, bw, bh)))
        elif ttype == 2:  # subtract green
            transforms.append(("sub_green",))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_img = _read_subimage(br, n_colors, 1)
            # palette entries are delta-coded component-wise
            pal = pal_img[0].astype(np.int32)
            pal = np.cumsum(pal, axis=0).astype(np.uint8)
            if n_colors > 16:
                ibits = 0
            elif n_colors > 4:
                ibits = 1
            elif n_colors > 2:
                ibits = 2
            else:
                ibits = 3
            xsize = (xsize + (1 << ibits) - 1) >> ibits
            transforms.append(("palette", pal))

    px = _decode_pixels(br, xsize, h, True)  # (h, xsize, 4) [a,r,g,b]

    for t in reversed(transforms):
        if t[0] == "palette":
            px = _inv_color_indexing(px, t[1], w)
        elif t[0] == "sub_green":
            _inv_subtract_green(px)
        elif t[0] == "pred":
            _inv_predictor(px, t[1], t[2])
        elif t[0] == "color":
            _inv_color_transform(px, t[1], t[2])
    if px.shape[1] != w:
        px = px[:, :w]

    rgb = px[..., 1:4][..., [0, 1, 2]]  # r, g, b
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    if (r == g).all() and (g == b).all():
        return np.ascontiguousarray(r)
    return np.ascontiguousarray(rgb)


@_codec_errors
def decode_webp(data: bytes) -> np.ndarray:
    """RIFF/WEBP container → image. VP8L (lossless) and VP8 (lossy,
    intra-frame) both decode for real (kernels/vp8.py)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + size]
        if tag in (b"VP8L", b"VP8 ") and len(payload) < size:
            raise ValueError("truncated WebP chunk")
        if tag == b"VP8L":
            return decode_vp8l(payload)
        if tag == b"VP8 ":
            from ragflow_ocr_spark.kernels import vp8 as vp8mod

            return vp8mod.decode_vp8(payload)
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container has no VP8L/VP8 chunk")


# ---------------------------------------------------------------- encoder
class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def _huffman_lengths(freqs: dict[int, int], maxlen: int = 15) -> dict[int, int]:
    """Package-merge-free simple Huffman with length cap via re-leveling."""
    import heapq

    syms = [s for s, f in freqs.items() if f > 0]
    if len(syms) <= 1:
        return {s: 1 for s in syms}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(freqs.items()) if f > 0]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in syms}
    i = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, i, s1 + s2))
        i += 1
    if max(depth.values()) > maxlen:
        # flatten: assign ceil-balanced lengths (valid, suboptimal)
        k = len(syms)
        bits = max(1, (k - 1).bit_length())
        if bits > maxlen:
            raise ValueError("alphabet too large for cap")
        # complete code: 2^bits slots, k used — pad by shortening none;
        # use canonical complete assignment: all at `bits` except
        # (2^bits - k) promoted one level up pairwise
        depth = {}
        promote = (1 << bits) - k
        for j, s in enumerate(sorted(syms)):
            depth[s] = bits - 1 if j < promote and bits > 1 else bits
    return depth


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    if len(lengths) == 1:
        # single-symbol code: the decoder reads ZERO bits per symbol
        return {next(iter(lengths)): (0, 0)}
    codes = {}
    code = 0
    prev_len = 0
    for ln, sym in sorted((ln, s) for s, ln in lengths.items()):
        code <<= ln - prev_len
        prev_len = ln
        rev = int(f"{code:0{ln}b}"[::-1], 2) if ln else 0
        codes[sym] = (rev, ln)
        code += 1
    return codes


def _write_prefix_code(bw: _BitWriter, lengths: dict[int, int], alphabet: int) -> None:
    """Emit a prefix code: simple form for 1-2 unit-length symbols,
    else the normal code-length-coded form (zero runs via 17/18; the
    full alphabet is covered so the decoder's read loop terminates)."""
    syms = sorted(lengths)
    if (
        1 <= len(syms) <= 2
        and all(lengths[s] == 1 for s in syms)
        and max(syms) < 256  # simple-form symbols are ≤ 8 bits wide
    ):
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        first_8 = 1 if syms[0] > 1 else 0
        bw.write(first_8, 1)
        bw.write(syms[0], 8 if first_8 else 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        return
    bw.write(0, 1)  # normal
    # (symbol, payload) stream covering ALL `alphabet` entries
    seq: list[tuple[int, int | None]] = []
    i = 0
    while i < alphabet:
        ln = lengths.get(i, 0)
        if ln:
            seq.append((ln, None))
            i += 1
            continue
        run = 0
        while i < alphabet and lengths.get(i, 0) == 0:
            run += 1
            i += 1
        while run >= 11:
            r = min(run, 138)
            seq.append((18, r - 11))
            run -= r
        while run >= 3:
            r = min(run, 10)
            seq.append((17, r - 3))
            run -= r
        seq.extend([(0, None)] * run)
    clc_freq: dict[int, int] = {}
    for s, _p in seq:
        clc_freq[s] = clc_freq.get(s, 0) + 1
    clc_len = _huffman_lengths(clc_freq, maxlen=7)
    clc_codes = _canonical_codes(clc_len)
    order_pos = {s: k for k, s in enumerate(_CLC_ORDER)}
    n_clc = max(4, max(order_pos[s] for s in clc_len) + 1)
    bw.write(n_clc - 4, 4)
    for k in range(n_clc):
        bw.write(clc_len.get(_CLC_ORDER[k], 0), 3)
    bw.write(0, 1)  # no max_symbol cap
    for s, p in seq:
        c, ln = clc_codes[s]
        bw.write(c, ln)
        if s == 17:
            bw.write(p, 3)
        elif s == 18:
            bw.write(p, 7)


def _lz77_code(value: int) -> tuple[int, int, int]:
    """value (≥1) → (prefix code, n extra bits, extra value)."""
    if value <= 4:
        return value - 1, 0, 0
    u = value - 1
    for code in range(4, 40):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset <= u < offset + (1 << extra):
            return code, extra, u - offset
    raise ValueError(f"LZ77 value {value} out of range")


class _Writer:
    """Symbol-level writer for one prefix-code group."""

    def __init__(self, tokens: list[tuple]):
        # tokens: ("lit", a, r, g, b) | ("copy", length, plane)
        self.tokens = tokens
        gf: dict[int, int] = {}
        rf: dict[int, int] = {}
        bf: dict[int, int] = {}
        af: dict[int, int] = {}
        df: dict[int, int] = {}
        for t in tokens:
            if t[0] == "lit":
                _k, a, r, g, b = t
                gf[g] = gf.get(g, 0) + 1
                rf[r] = rf.get(r, 0) + 1
                bf[b] = bf.get(b, 0) + 1
                af[a] = af.get(a, 0) + 1
            else:
                lcode, _e, _v = _lz77_code(t[1])
                gf[256 + lcode] = gf.get(256 + lcode, 0) + 1
                dcode, _e2, _v2 = _lz77_code(t[2])
                df[dcode] = df.get(dcode, 0) + 1
        # every alphabet needs ≥1 symbol for a decodable code
        for f in (gf, rf, bf, af, df):
            if not f:
                f[0] = 1
        self.freqs = (gf, rf, bf, af, df)

    def emit(self, bw: _BitWriter) -> None:
        gl = _huffman_lengths(self.freqs[0])
        rl = _huffman_lengths(self.freqs[1])
        bl = _huffman_lengths(self.freqs[2])
        al = _huffman_lengths(self.freqs[3])
        dl = _huffman_lengths(self.freqs[4])
        _write_prefix_code(bw, gl, 256 + 24)
        _write_prefix_code(bw, rl, 256)
        _write_prefix_code(bw, bl, 256)
        _write_prefix_code(bw, al, 256)
        _write_prefix_code(bw, dl, 40)
        gc, rc, bc, ac, dc = map(
            _canonical_codes, (gl, rl, bl, al, dl)
        )
        for t in self.tokens:
            if t[0] == "lit":
                _k, a, r, g, b = t
                for codes, sym in ((gc, g), (rc, r), (bc, b), (ac, a)):
                    c, ln = codes[sym]
                    bw.write(c, ln)
            else:
                lcode, le, lv = _lz77_code(t[1])
                c, ln = gc[256 + lcode]
                bw.write(c, ln)
                bw.write(lv, le)
                dcode, de, dv = _lz77_code(t[2])
                c, ln = dc[dcode]
                bw.write(c, ln)
                bw.write(dv, de)


def _tokens_from_argb(argb: np.ndarray, rle: bool) -> list[tuple]:
    """(h, w, 4) [a,r,g,b] → literal/copy tokens (row-major). With
    ``rle``, runs of the previous pixel become LZ77 copies at
    distance 1 (plane code 121) — exercising the decoder's
    back-reference path."""
    h, w = argb.shape[:2]
    flat = argb.reshape(-1, 4)
    tokens: list[tuple] = []
    n = len(flat)
    i = 0
    while i < n:
        if rle and i > 0 and (flat[i] == flat[i - 1]).all():
            run = 1
            while i + run < n and run < 4000 and (flat[i + run] == flat[i - 1]).all():
                run += 1
            tokens.append(("copy", run, 121))  # distance 1 → plane 1+120
            i += run
            continue
        a, r, g, b = (int(x) for x in flat[i])
        tokens.append(("lit", a, r, g, b))
        i += 1
    return tokens


def encode_vp8l(
    img: np.ndarray,
    rle: bool = True,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    palette: bool = False,
) -> bytes:
    """uint8 gray / RGB → raw VP8L payload. Optional forward
    transforms exist to round-trip-test the decoder's inverse paths."""
    if img.ndim == 2:
        r = g = b = img
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
    h, w = img.shape[:2]
    argb = np.stack(
        [np.full((h, w), 255, np.uint8), r, g, b], axis=-1
    ).astype(np.uint8)

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha hint
    bw.write(0, 3)  # version

    if palette:
        if subtract_green or predictor_mode is not None:
            raise ValueError("palette mode is standalone in this encoder")
        colors, inv = np.unique(
            argb.reshape(-1, 4), axis=0, return_inverse=True
        )
        n_colors = len(colors)
        if n_colors > 256:
            raise ValueError("palette mode needs <=256 colors")
        idx = inv.astype(np.uint8).reshape(h, w)
        bw.write(1, 1)
        bw.write(3, 2)  # color-indexing transform
        bw.write(n_colors - 1, 8)
        # palette subimage: 1 x n_colors, component-wise delta-coded
        deltas = colors.astype(np.int16)
        deltas[1:] -= colors[:-1].astype(np.int16)
        pal_img = (deltas & 0xFF).astype(np.uint8).reshape(1, n_colors, 4)
        bw.write(0, 1)  # subimage: no color cache
        _Writer(_tokens_from_argb(pal_img, rle=False)).emit(bw)
        # pixel bundling: pack 2^ibits indices per green byte
        if n_colors > 16:
            ibits = 0
        elif n_colors > 4:
            ibits = 1
        elif n_colors > 2:
            ibits = 2
        else:
            ibits = 3
        if ibits:
            per = 1 << ibits
            sub = 8 >> ibits
            pw = (w + per - 1) // per
            packed = np.zeros((h, pw), np.uint8)
            for k in range(per):
                cols = np.arange(k, w, per)
                packed[:, : len(cols)] |= (idx[:, cols] << (k * sub)).astype(
                    np.uint8
                )
            idx_img = packed
        else:
            idx_img = idx
        ph, pww = idx_img.shape
        bundled = np.zeros((ph, pww, 4), np.uint8)
        bundled[..., 0] = 255
        bundled[..., 2] = idx_img
        bw.write(0, 1)  # end of transforms
        bw.write(0, 1)  # no color cache
        bw.write(0, 1)  # no meta prefix image
        _Writer(_tokens_from_argb(bundled, rle)).emit(bw)
        return bw.done()

    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # transform type 2
        a2 = argb.astype(np.int16)
        a2[..., 1] -= a2[..., 2]
        a2[..., 3] -= a2[..., 2]
        argb = (a2 & 0xFF).astype(np.uint8)
    if predictor_mode is not None:
        bw.write(1, 1)
        bw.write(0, 2)  # transform type 0
        bits = 4  # 16x16 blocks
        bw.write(bits - 2, 3)
        bwid = (w + (1 << bits) - 1) >> bits
        bhei = (h + (1 << bits) - 1) >> bits
        # sub-image of predictor modes (mode in the green field)
        modes = np.zeros((bhei, bwid, 4), np.uint8)
        modes[..., 0] = 255
        modes[..., 2] = predictor_mode
        sub_bw_tokens = _tokens_from_argb(modes, rle=True)
        # forward-predict: residual = px - pred(original neighbors)
        src = argb.astype(np.int32)
        res = src.copy()
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = (255, 0, 0, 0)
                elif y == 0:
                    pred = tuple(src[y, x - 1])
                elif x == 0:
                    pred = tuple(src[y - 1, x])
                else:
                    if predictor_mode == 2:
                        pred = tuple(src[y - 1, x])
                    elif predictor_mode == 1:
                        pred = tuple(src[y, x - 1])
                    elif predictor_mode == 7:
                        L, T = src[y, x - 1], src[y - 1, x]
                        pred = tuple((int(L[c]) + int(T[c])) // 2 for c in range(4))
                    else:
                        raise ValueError(
                            "encoder supports forward predictor modes 1/2/7"
                        )
                for c in range(4):
                    res[y, x, c] = (src[y, x, c] - pred[c]) & 0xFF
        # sub-image: no meta bit (it IS a subimage): cache flag + codes
        bw.write(0, 1)  # no color cache in subimage
        _Writer(sub_bw_tokens).emit(bw)
        argb = res.astype(np.uint8)
    bw.write(0, 1)  # end of transforms

    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix image
    _Writer(_tokens_from_argb(argb, rle)).emit(bw)
    return bw.done()


def encode_webp(img: np.ndarray, **kw) -> bytes:
    payload = encode_vp8l(img, **kw)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
