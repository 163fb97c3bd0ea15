"""Property-based robustness tests (hypothesis) — the never-crash
invariants the per-row error contract depends on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from ragflow_ocr_spark.kernels import font5x7, pngcodec
from ragflow_ocr_spark.kernels.html_extract import extract_html
from ragflow_ocr_spark.kernels.ocr_pipeline import extract_payload
from ragflow_ocr_spark.kernels.reading_order import sorted_boxes


@given(st.binary(max_size=4096))
@settings(max_examples=150, deadline=None)
def test_extract_html_never_raises(data):
    text, n, status = extract_html(data)
    assert status in ("ok", "empty", "error:null", "error:parse")
    assert (text is None) == status.startswith("error")


@given(st.binary(max_size=2048))
@settings(max_examples=100, deadline=None)
def test_extract_payload_never_raises(data):
    r = extract_payload(data)
    assert r.status
    # any non-crash outcome is contractually valid; text None ⇔ error
    assert (r.text is None) == r.status.startswith("error")


# random bytes almost never carry a codec magic, so the generic fuzzer
# above barely reaches the decoders — these force each route
_MAGICS = [
    b"\x89PNG\r\n\x1a\n",
    b"\xff\xd8\xff\xe0",
    b"BM\x00\x00\x00\x00\x00\x00\x00\x00",
    b"II*\x00",
    b"MM\x00*",
    b"%PDF-1.4\n",
    b"GIF89a",
    b"GIF87a",
    b"RIFF\x10\x00\x00\x00WEBPVP8L",
    b"RIFF\x10\x00\x00\x00WEBPVP8 ",  # lossy VP8 route (kernels/vp8)
    # animated container route (VP8X + ANIM/ANMF compositing)
    b"RIFF\x40\x00\x00\x00WEBPVP8X\x0a\x00\x00\x00\x02\x00\x00\x00"
    b"\x1f\x00\x00\x17\x00\x00",
]


@given(st.binary(max_size=768))
@settings(max_examples=120, deadline=None)
def test_pdf_parser_structured_fuzz_never_raises_through_router(tail):
    """Seed the fuzz with real PDF syntax fragments so the object
    parser, dict tokenizer and content interpreter are actually
    reached (pure random bytes die at the %PDF check)."""
    payload = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Page /Contents 2 0 R >>\nendobj\n"
        b"2 0 obj\n" + tail
    )
    r = extract_payload(payload)
    assert r.status
    assert (r.text is None) == r.status.startswith("error")


@given(st.sampled_from(_MAGICS), st.binary(max_size=512))
@settings(max_examples=150, deadline=None)
def test_extract_payload_fuzzed_codec_routes_never_raise(magic, tail):
    r = extract_payload(magic + tail)
    assert r.status
    assert (r.text is None) == r.status.startswith("error")


@given(st.binary(max_size=512))
@settings(max_examples=100, deadline=None)
def test_codec_decoders_raise_value_error_only(tail):
    from ragflow_ocr_spark.kernels import imgcodecs

    for magic, dec in [
        (b"BM\x00\x00\x00\x00\x00\x00\x00\x00", imgcodecs.decode_bmp),
        (b"II*\x00", imgcodecs.decode_tiff),
        (b"\xff\xd8\xff\xe0", imgcodecs.decode_jpeg),
    ]:
        try:
            out = dec(magic + tail)
            assert out.dtype == np.uint8
        except ValueError:
            pass  # the only contractually-allowed exception type


@given(
    st.integers(2, 40),
    st.integers(2, 40),
    st.integers(1, 3),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_random_shapes(h, w, channels):
    rng = np.random.default_rng(h * 100 + w)
    shape = (h, w) if channels != 3 else (h, w, 3)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    if channels == 2:  # gray path again, different seed mix
        img = img.reshape(h, w) if img.ndim == 2 else img[:, :, 0]
    out = pngcodec.decode_png(pngcodec.encode_png(img))
    assert np.array_equal(out, img)


@given(st.lists(st.tuples(st.integers(0, 500), st.integers(0, 500)), min_size=0, max_size=12))
@settings(max_examples=80, deadline=None)
def test_sorted_boxes_is_permutation(corners):
    boxes = np.array(
        [
            [[x, y], [x + 10, y], [x + 10, y + 8], [x, y + 8]]
            for x, y in corners
        ],
        dtype=np.float64,
    ).reshape(len(corners), 4, 2)
    out = sorted_boxes(boxes)
    assert len(out) == len(corners)
    a = sorted(map(lambda b: tuple(b.ravel()), boxes))
    b = sorted(map(lambda b: tuple(b.ravel()), out))
    assert a == b


@given(st.text(max_size=60), st.integers(1, 3))
@settings(max_examples=60, deadline=None)
def test_render_sanitize_contract(text, scale):
    """Whatever render_page draws, it reports as ground truth exactly
    the sanitized, fitted string."""
    img, drawn = font5x7.render_page([text], width=480, height=96, scale=scale)
    for line in drawn:
        assert line == font5x7.sanitize(line)  # idempotent
        assert line.strip() == line


@given(st.integers(0, 2), st.binary(max_size=512))
@settings(max_examples=100, deadline=None)
def test_bmp_rle_and_subbyte_fuzz_value_error_only(comp, tail):
    """Structured BMP fuzz reaching the RLE and sub-byte paths: a valid
    54-byte header declaring RLE8/RLE4/1-bit with attacker-controlled
    stream bytes must decode to uint8 or raise ValueError, never crash
    or write outside the declared allocation."""
    import struct

    from ragflow_ocr_spark.kernels import imgcodecs

    bpp = {0: 8, 1: 4, 2: 1}[comp]
    compression = {0: 1, 1: 2, 2: 0}[comp]  # RLE8, RLE4, uncompressed 1-bit
    pal = bytes(64)  # 16 entries
    off = 54 + len(pal)
    info = struct.pack(
        "<IiiHHIIiiII", 40, 9, 5, 1, bpp, compression, len(tail), 0, 0, 16, 0
    )
    head = struct.pack("<2sIHHI", b"BM", off + len(tail), 0, 0, off)
    try:
        out = imgcodecs.decode_bmp(head + info + pal + tail)
        assert out.dtype == np.uint8 and out.shape[:2] == (5, 9)
    except ValueError:
        pass


@given(st.binary(max_size=256), st.integers(1, 4).filter(lambda b: b != 3))
@settings(max_examples=80, deadline=None)
def test_png_subbyte_fuzz_value_error_only(tail, depth):
    """Sub-byte/16-bit PNG fuzz: valid IHDR + arbitrary IDAT bytes must
    decode or raise ValueError (zlib/size/filter errors), never crash."""
    import struct
    import zlib as _z

    d = {1: 1, 2: 2, 4: 4}.get(depth, 16)
    ihdr = struct.pack(">IIBBBBB", 7, 3, d, 0, 0, 0, 0)
    def chunk(tag, payload):
        c = struct.pack(">I", len(payload)) + tag + payload
        return c + struct.pack(">I", _z.crc32(tag + payload) & 0xFFFFFFFF)
    data = (
        pngcodec.PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", tail) + chunk(b"IEND", b"")
    )
    try:
        out = pngcodec.decode_png(data)
        assert out.dtype == np.uint8
    except ValueError:
        pass
