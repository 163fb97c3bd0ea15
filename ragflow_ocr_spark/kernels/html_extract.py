"""Readability-style main-content extraction over raw HTML bytes.

This is the webtext graft of the reference's detect→score→filter→order
→emit pipeline shape (SURVEY.md §2.11):

    reference (images)                 this kernel (HTML)
    ------------------                 ------------------
    contours        (postprocess.py:125-130)  block-level elements
    box_score_fast  (postprocess.py:194-209)  text/link-density score
    box_thresh filter (postprocess.py:142-147) score >= tau + smoothing
    sorted_boxes    (ocr/ocr.py:467-488)      document order
    text zip        (ocr/ocr.py:566-571)      "\n".join(block texts)

Implementation is stdlib-only (``html.parser``) — lxml is not available
in this environment and determinism matters more than parser speed: the
per-url extracted text is the byte-identity contract, so parsing rules
and tie-breaks are pinned here and golden-tested.

Determinism rules (pinned):
- bytes are decoded as UTF-8 with ``errors="replace"``;
- whitespace inside a block collapses to single spaces, stripped;
- blocks are emitted in document order, joined with ``"\n"``;
- entity refs are resolved by ``convert_charrefs=True``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

from ragflow_ocr_spark.config import HtmlConfig

# Tags whose entire subtree is never content.
_SKIP_SUBTREE = frozenset(
    {"script", "style", "noscript", "template", "svg", "iframe", "head"}
)
# Landmark tags whose subtree is boilerplate by construction.
_BOILERPLATE_SUBTREE = frozenset({"nav", "footer", "aside", "header"})
# Tags that open a new text block (document-order candidates).
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "td", "li", "h1", "h2", "h3", "h4", "h5", "h6",
        "article", "section", "blockquote", "pre", "main", "figcaption",
        "dd", "dt", "caption", "summary",
    }
)
# Void elements never get a matching end tag (HTML5 spec list).
_VOID = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)
# Heading/content tags get a score boost so short titles survive.
_TAG_WEIGHT = {
    "h1": 2.0, "h2": 1.8, "h3": 1.6, "h4": 1.4, "h5": 1.3, "h6": 1.2,
    "p": 1.5, "article": 1.5, "blockquote": 1.4, "pre": 1.4,
    "li": 0.8, "td": 0.8,
}


@dataclass
class _Block:
    tag: str
    order: int
    text_parts: list[str] = field(default_factory=list)
    link_chars: int = 0

    def text(self) -> str:
        return " ".join(" ".join(self.text_parts).split())


class _BlockParser(HTMLParser):
    """Single pass over the document collecting block candidates."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._stack: list[str] = []
        self._skip_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._open_blocks: list[_Block] = []
        self._order = 0

    # -- tag events -------------------------------------------------
    def handle_starttag(self, tag, attrs):  # noqa: ANN001
        tag = tag.lower()
        if tag in _VOID:
            if tag == "br" and self._open_blocks:
                self._open_blocks[-1].text_parts.append(" ")
            return
        self._stack.append(tag)
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
        if tag in _BOILERPLATE_SUBTREE:
            self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_TAGS and not self._skip_depth and not self._boiler_depth:
            blk = _Block(tag=tag, order=self._order)
            self._order += 1
            self._open_blocks.append(blk)
            self.blocks.append(blk)

    def handle_endtag(self, tag):  # noqa: ANN001
        tag = tag.lower()
        if tag in _VOID:
            return
        # Pop to the matching open tag; tolerate misnesting by popping
        # everything above it (browsers do the same for block tags).
        if tag in self._stack:
            while self._stack:
                top = self._stack.pop()
                if top in _SKIP_SUBTREE:
                    self._skip_depth -= 1
                if top in _BOILERPLATE_SUBTREE:
                    self._boiler_depth -= 1
                if top == "a":
                    self._link_depth -= 1
                if (
                    top in _BLOCK_TAGS
                    and self._open_blocks
                    and self._open_blocks[-1].tag == top
                ):
                    self._open_blocks.pop()
                if top == tag:
                    break

    # -- text -------------------------------------------------------
    def handle_data(self, data):  # noqa: ANN001
        if self._skip_depth or self._boiler_depth:
            return
        if not data or not data.strip():
            return
        if self._open_blocks:
            blk = self._open_blocks[-1]
            blk.text_parts.append(data)
            if self._link_depth:
                blk.link_chars += len("".join(data.split()))


def _score(block: _Block, cfg: HtmlConfig) -> float:
    """Text-density × (1 − link-density)² × tag weight.

    Analogue of the reference's mean-probability box score
    (``/root/reference/ocr/postprocess.py:194-209``): a scalar per
    candidate thresholded downstream.
    """
    txt = block.text()
    n = len(txt)
    if n == 0:
        return 0.0
    nonspace = len("".join(txt.split()))
    link_density = min(1.0, block.link_chars / nonspace) if nonspace else 1.0
    w = _TAG_WEIGHT.get(block.tag, 1.0)
    return n * (1.0 - link_density) ** 2 * w


def extract_html(data: bytes | None, cfg: HtmlConfig | None = None) -> tuple[str | None, int, str]:
    """bytes → (extracted_text | None, n_blocks, status).

    status ∈ {"ok", "empty", "error:null", "error:parse"}. Never raises
    — the null/invalid guard mirrors the reference returning
    ``(None, None, time_dict)`` on a bad image
    (``/root/reference/ocr/ocr.py:540-541``).
    """
    cfg = cfg or HtmlConfig()
    if data is None or len(data) == 0:
        return None, 0, "error:null"
    try:
        text = data.decode("utf-8", errors="replace")
        parser = _BlockParser()
        parser.feed(text)
        parser.close()
    except Exception:
        return None, 0, "error:parse"

    # Leaf-preference: a block whose text is fully contained in a later
    # (nested) block would double-count; since nested blocks open after
    # their parent and text goes to the innermost open block only
    # (handle_data appends to the top of _open_blocks), containers with
    # no direct text naturally score 0. No extra dedup pass needed.
    cands = [(b, _score(b, cfg)) for b in parser.blocks]
    scores = [s for _, s in cands]

    kept: list[str] = []
    for i, (b, s) in enumerate(cands):
        prev_s = scores[i - 1] if i > 0 else 0.0
        next_s = scores[i + 1] if i + 1 < len(scores) else 0.0
        eff = s + cfg.neighbor_bonus * (prev_s + next_s) / 2.0
        if eff < cfg.min_block_score:
            continue
        txt = b.text()
        if len(txt) < cfg.min_text_len and s < cfg.min_block_score:
            continue
        nonspace = len("".join(txt.split()))
        if nonspace:
            ld = b.link_chars / nonspace
            if ld > cfg.link_density_max:
                continue
        if txt:
            kept.append(txt)

    if not kept:
        return "", 0, "empty"
    return "\n".join(kept), len(kept), "ok"
