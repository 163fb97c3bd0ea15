"""Deterministic 5×7 bitmap font + synthetic page-image rendering.

Replaces the reference's ``cv2.putText`` fixture synthesis
(``/root/reference/test/test_ocr.py:13-30``,
``/root/reference/benchmark.py:24-47``) with a seedable, dependency-free
renderer. The same glyph grids double as the recognition stub network's
templates (``stubnet.py``) — drawn text survives the full detect→crop→
recognize round trip, so goldens are real end-to-end assertions.
"""

from __future__ import annotations

import numpy as np

# Row bitmaps, 7 rows × 5 bits per glyph, MSB = leftmost column.
_FONT_ROWS: dict[str, tuple[int, ...]] = {
    "A": (0b01110, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "B": (0b11110, 0b10001, 0b10001, 0b11110, 0b10001, 0b10001, 0b11110),
    "C": (0b01110, 0b10001, 0b10000, 0b10000, 0b10000, 0b10001, 0b01110),
    "D": (0b11110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b11110),
    "E": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b11111),
    "F": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b10000),
    "G": (0b01110, 0b10001, 0b10000, 0b10111, 0b10001, 0b10001, 0b01111),
    "H": (0b10001, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "I": (0b01110, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "J": (0b00111, 0b00010, 0b00010, 0b00010, 0b00010, 0b10010, 0b01100),
    "K": (0b10001, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010, 0b10001),
    "L": (0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b11111),
    "M": (0b10001, 0b11011, 0b10101, 0b10101, 0b10001, 0b10001, 0b10001),
    "N": (0b10001, 0b11001, 0b10101, 0b10011, 0b10001, 0b10001, 0b10001),
    "O": (0b01110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "P": (0b11110, 0b10001, 0b10001, 0b11110, 0b10000, 0b10000, 0b10000),
    "Q": (0b01110, 0b10001, 0b10001, 0b10001, 0b10101, 0b10010, 0b01101),
    "R": (0b11110, 0b10001, 0b10001, 0b11110, 0b10100, 0b10010, 0b10001),
    "S": (0b01111, 0b10000, 0b10000, 0b01110, 0b00001, 0b00001, 0b11110),
    "T": (0b11111, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100),
    "U": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "V": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100),
    "W": (0b10001, 0b10001, 0b10001, 0b10101, 0b10101, 0b11011, 0b10001),
    "X": (0b10001, 0b10001, 0b01010, 0b00100, 0b01010, 0b10001, 0b10001),
    "Y": (0b10001, 0b10001, 0b01010, 0b00100, 0b00100, 0b00100, 0b00100),
    "Z": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0b11111),
    "0": (0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110),
    "1": (0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "2": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0b01000, 0b11111),
    "3": (0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110),
    "4": (0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010),
    "5": (0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110),
    "6": (0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110),
    "7": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000),
    "8": (0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110),
    "9": (0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100),
    ".": (0b00000, 0b00000, 0b00000, 0b00000, 0b00000, 0b01100, 0b01100),
    ",": (0b00000, 0b00000, 0b00000, 0b00000, 0b00110, 0b00110, 0b01100),
    "-": (0b00000, 0b00000, 0b00000, 0b01110, 0b00000, 0b00000, 0b00000),
    ":": (0b00000, 0b01100, 0b01100, 0b00000, 0b01100, 0b01100, 0b00000),
}

GLYPH_H = 7
GLYPH_W = 5
ADVANCE = 6  # glyph + 1 column gap
SPACE_ADVANCE = 6

# Charset in classifier order (the stub rec net's class axis). The CTC
# charset used downstream is this list with 'blank' prepended and ' '
# appended — same construction as the reference
# (``/root/reference/ocr/postprocess.py:280-281,368-370``).
CHARSET: list[str] = sorted(_FONT_ROWS.keys())


def glyph_grid(ch: str) -> np.ndarray:
    """7×5 bool grid for a glyph."""
    rows = _FONT_ROWS[ch]
    g = np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
    for r, bits in enumerate(rows):
        for c in range(GLYPH_W):
            g[r, c] = bool((bits >> (GLYPH_W - 1 - c)) & 1)
    return g


def sanitize(text: str) -> str:
    """Uppercase, drop characters outside the font, collapse whitespace
    runs to single spaces and strip — leading/trailing/double spaces
    are unrenderable as ink, so the sanitized string is exactly what a
    recognizer can recover (the ground-truth contract)."""
    out = []
    for ch in text.upper():
        if ch == " " or ch in _FONT_ROWS:
            out.append(ch)
    return " ".join("".join(out).split())


def render_line(text: str, scale: int = 2) -> np.ndarray:
    """Render one text line → bool ink mask (7·s, advance·s·len)."""
    text = sanitize(text)
    if not text:
        return np.zeros((GLYPH_H * scale, 1), dtype=bool)
    w = sum(SPACE_ADVANCE if c == " " else ADVANCE for c in text)
    canvas = np.zeros((GLYPH_H, w), dtype=bool)
    x = 0
    for ch in text:
        if ch == " ":
            x += SPACE_ADVANCE
            continue
        canvas[:, x : x + GLYPH_W] = glyph_grid(ch)
        x += ADVANCE
    if scale != 1:
        canvas = np.kron(canvas, np.ones((scale, scale), dtype=bool))
    return canvas


def render_page(
    lines: list[str],
    width: int = 960,
    height: int = 640,
    scale: int = 2,
    margin: int = 24,
    line_gap: int = 12,
) -> tuple[np.ndarray, list[str]]:
    """White page (uint8 gray, 255=paper 0=ink) with text lines placed
    top-to-bottom at the left margin. Returns (image, drawn_lines) where
    drawn_lines are the sanitized strings that actually fit — the
    ground truth for the full pipeline."""
    img = np.full((height, width), 255, dtype=np.uint8)
    y = margin
    drawn: list[str] = []
    lh = GLYPH_H * scale
    avail = width - 2 * margin
    for raw in lines:
        text = sanitize(raw)
        if not text.strip():
            continue
        if y + lh + margin > height:
            break
        # truncate at a glyph boundary so no partial ink is drawn and
        # the recorded ground truth equals exactly what is on the page
        x_units = 0
        fit = []
        for ch in text:
            adv = SPACE_ADVANCE if ch == " " else ADVANCE
            if (x_units + adv) * scale > avail:
                break
            fit.append(ch)
            x_units += adv
        text = "".join(fit).strip()
        if not text:
            continue
        ink = render_line(text, scale)
        img[y : y + lh, margin : margin + ink.shape[1]][ink] = 0
        drawn.append(text)
        y += lh + line_gap
    return img, drawn
