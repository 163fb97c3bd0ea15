"""CTC greedy decode — semantics of the reference's ``CTCLabelDecode``
(``/root/reference/ocr/postprocess.py:311-366``):

- per timestep argmax over the class axis + its softmax probability
  (the reference consumes already-softmaxed preds; our stub emits
  logits, so we softmax here — same downstream math);
- drop adjacent duplicates (``postprocess.py:316-322``);
- drop blank (token 0, ``postprocess.py:343-344``);
- confidence = mean of kept-step probabilities; empty → 0.0
  (``postprocess.py:328-340``).
"""

from __future__ import annotations

import re

import numpy as np

# the reference's LTR-run character class (``postprocess.py:295``)
_LTR_CHAR = re.compile(r"[a-zA-Z0-9 :*./%+-]")


def pred_reverse(pred: str) -> str:
    """Segment-wise RTL reorder — exact semantics of the reference's
    ``pred_reverse`` (``/root/reference/ocr/postprocess.py:292-306``),
    applied when the charset is Arabic (dict path contains 'arabic',
    ``postprocess.py:283-284``): maximal runs of LTR characters
    ([a-zA-Z0-9 :*./%+-]) stay in order internally; every other
    character is its own segment; the segment list is reversed."""
    segments: list[str] = []
    current = ""
    for c in pred:
        if not _LTR_CHAR.search(c):
            if current:
                segments.append(current)
            segments.append(c)
            current = ""
        else:
            current += c
    if current:
        segments.append(current)
    return "".join(segments[::-1])


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def ctc_greedy_decode(
    logits: np.ndarray, charset: list[str], reverse: bool = False
) -> list[tuple[str, float]]:
    """(B, T, C) logits → [(text, score)] per batch element.

    ``charset`` is the class list WITHOUT the blank; class index i>0
    maps to charset[i-1] (blank prepended like the reference's
    ``add_special_char``, ``postprocess.py:368-370``). ``reverse``
    applies :func:`pred_reverse` to each text (the reference sets it
    when the dict path contains 'arabic', ``postprocess.py:283-284``).
    """
    probs = softmax(logits.astype(np.float64), axis=2)
    idx = probs.argmax(axis=2)            # (B, T)
    maxp = probs.max(axis=2)              # (B, T)
    out: list[tuple[str, float]] = []
    for b in range(logits.shape[0]):
        ids = idx[b]
        ps = maxp[b]
        # adjacent-duplicate removal BEFORE blank removal — order
        # matters for repeated chars ("LL" must survive via L,blank,L)
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = ids[1:] != ids[:-1]
        keep &= ids != 0
        chars = [charset[i - 1] for i in ids[keep]]
        confs = ps[keep]
        score = float(confs.mean()) if confs.size else 0.0
        text = "".join(chars)
        if reverse:
            text = pred_reverse(text)
        out.append((text, score))
    return out
