"""Reading-order sort of detection quads.

Exact semantics of the reference's ``sorted_boxes``
(``/root/reference/ocr/ocr.py:467-488``): primary sort by
(y of top-left, x of top-left), then a single adjacent bubble pass —
scanning j from i down to 0, swap neighbors when the lower box's
top-left y is within 10 px AND its x is smaller, breaking at the first
non-swap. This is deliberately NOT a total order (SURVEY.md §7
hard-part 2); a plain ORDER BY (y, x) produces different output for
same-row boxes with y-jitter, so the quirk is preserved verbatim and
unit-tested against hand-computed cases.
"""

from __future__ import annotations

import numpy as np


def sorted_boxes(dt_boxes: np.ndarray) -> list[np.ndarray]:
    """(N, 4, 2) quads → list of quads in reading order."""
    num_boxes = dt_boxes.shape[0]
    boxes = sorted(dt_boxes, key=lambda x: (x[0][1], x[0][0]))
    _boxes = list(boxes)
    for i in range(num_boxes - 1):
        for j in range(i, -1, -1):
            if (
                abs(_boxes[j + 1][0][1] - _boxes[j][0][1]) < 10
                and _boxes[j + 1][0][0] < _boxes[j][0][0]
            ):
                _boxes[j], _boxes[j + 1] = _boxes[j + 1], _boxes[j]
            else:
                break
    return _boxes
