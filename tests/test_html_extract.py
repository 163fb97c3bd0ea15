"""Kernel tests for readability-style HTML extraction."""

from __future__ import annotations

from ragflow_ocr_spark.kernels.html_extract import extract_html

ARTICLE = (
    b"<html><head><title>T</title><style>.x{}</style></head><body>"
    b"<header><h1>Site Brand</h1></header>"
    b'<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>'
    b"<article><h2>The Headline Here</h2>"
    b"<p>First paragraph of real content with plenty of words to be scored highly.</p>"
    b'<p>Second paragraph, one <a href="/r">link</a> but low link density overall here.</p>'
    b"</article>"
    b'<div class="sidebar"><ul><li><a href="/x">Rel 1</a></li><li><a href="/y">Rel 2</a></li></ul></div>'
    b'<footer><p>Copyright <a href="/tos">Terms</a> <a href="/p">Privacy</a></p></footer>'
    b"</body></html>"
)


def test_article_extracted_boilerplate_dropped():
    text, n, status = extract_html(ARTICLE)
    assert status == "ok"
    assert n == 3
    lines = text.split("\n")
    assert lines[0] == "The Headline Here"
    assert "Home" not in text and "Copyright" not in text
    assert "Site Brand" not in text  # header boilerplate


def test_null_and_empty():
    assert extract_html(None) == (None, 0, "error:null")
    assert extract_html(b"") == (None, 0, "error:null")


def test_only_boilerplate_is_empty():
    t, n, s = extract_html(b'<body><nav><a href="/">x</a></nav><footer>f</footer></body>')
    assert (t, n, s) == ("", 0, "empty")


def test_link_farm_dropped():
    farm = b"<div>" + b'<a href="/x">word word word</a> ' * 30 + b"</div>"
    t, n, s = extract_html(farm)
    assert s == "empty"


def test_whitespace_collapsed_deterministic():
    t, _, _ = extract_html(b"<p>a   lot\n\n of \t whitespace   in this paragraph text</p>")
    assert t == "a lot of whitespace in this paragraph text"


def test_misnested_tags_tolerated():
    bad = b"<div>" * 500 + b"<p>content paragraph that is long enough to pass scoring</p></span></div>"
    t, n, s = extract_html(bad)
    assert s == "ok"
    assert "content paragraph" in t


def test_non_utf8_replaced_not_fatal():
    t, n, s = extract_html(b"\xff\xfe<p>valid long paragraph content that survives decoding</p>\x81")
    assert s == "ok"
    assert "valid long paragraph" in t


def test_nested_blocks_no_double_count():
    html = b"<div><p>inner paragraph long enough to be kept by the scorer</p></div>"
    t, n, s = extract_html(html)
    assert n == 1
    assert t.count("inner paragraph") == 1


def test_br_becomes_space():
    t, _, _ = extract_html(b"<p>first part<br>second part of this long enough paragraph</p>")
    assert "first part second part" in t


def test_script_and_style_excluded():
    html = (
        b"<script>var x = 'scripted content that must never appear';</script>"
        b"<p>actual paragraph content long enough for keeping around</p>"
    )
    t, _, _ = extract_html(html)
    assert "scripted" not in t
    assert "actual paragraph" in t


def test_multi_megabyte_row():
    """A ~5 MB single-block page extracts correctly and boundedly (the
    worst realistic skew row is ~100x median; this is ~1000x)."""
    from ragflow_ocr_spark.kernels.html_extract import extract_html

    body = ("lorem ipsum dolor sit amet consectetur " * 20 + ". ") * 6000
    html = f"<html><body><article><p>{body}</p></article></body></html>".encode()
    assert len(html) > 4_000_000
    text, n, status = extract_html(html)
    assert status == "ok" and n == 1
    assert text == " ".join(body.split())


def test_unicode_torture():
    """CJK, emoji, RTL, combining marks survive byte-exact (UTF-8
    decode + whitespace collapse are the only transforms)."""
    from ragflow_ocr_spark.kernels.html_extract import extract_html

    s = "漢字テスト 🚀🎉 عربى עברית étude ligature ﬁ end of sentence here"
    html = f"<article><p>{s} {s} {s}</p></article>".encode()
    text, n, status = extract_html(html)
    assert status == "ok" and n == 1
    assert text == " ".join(f"{s} {s} {s}".split())
