"""Result sinks (SURVEY.md §2.1 S6/S7/S8).

- JSON sink  ⇔ the reference's per-image stats JSON
  (``/root/reference/test/test_image.py:116-119``)
- text sink  ⇔ numbered "text (score)" lines (``run_ocr.py:104-113``)
- visualization sink ⇔ box overlay images (``quick_start.py:68-81``) —
  numpy polyline drawing + our PNG encoder (debug tool, driver-side).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def write_json(extracted: DataFrame, path: str, partitions: int | None = None) -> None:
    """Extracted rows → JSON lines. Line-delimited JSON is the
    standard interchange at scale (one shuffle-free write)."""
    df = extracted
    if partitions:
        df = df.coalesce(partitions)
    df.write.mode("overwrite").json(path)


def write_text(extracted: DataFrame, path: str) -> None:
    """Debug sink: 'url<TAB>n_blocks<TAB>text' with backslash, tab,
    and newline escaped (in that order — backslash first, so '\\n' in
    source text stays distinguishable from an escaped newline and the
    3-column format is unambiguous)."""
    body = F.coalesce(F.col("extracted_text"), F.lit(""))
    body = F.regexp_replace(body, "\\\\", "\\\\\\\\")
    body = F.regexp_replace(body, "\t", "\\\\t")
    body = F.regexp_replace(body, "\n", "\\\\n")
    lines = extracted.select(
        F.concat_ws(
            "\t",
            F.col("url"),
            F.col("n_blocks").cast("string"),
            body,
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)


def _draw_line(img: np.ndarray, x0: int, y0: int, x1: int, y1: int, val: int) -> None:
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1))
    xs = np.linspace(x0, x1, n + 1).round().astype(int)
    ys = np.linspace(y0, y1, n + 1).round().astype(int)
    h, w = img.shape[:2]
    m = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[m], xs[m]] = val


def draw_boxes(img: np.ndarray, boxes: list, val: int = 0) -> np.ndarray:
    """Overlay quad outlines on a copy of a grayscale page image —
    the cv2.polylines equivalent (``/root/reference/quick_start.py:68-81``)."""
    out = img.copy()
    for quad in boxes:
        q = np.asarray(quad)
        for i in range(4):
            j = (i + 1) % 4
            _draw_line(out, int(q[i][0]), int(q[i][1]), int(q[j][0]), int(q[j][1]), val)
    return out


def save_visualization(img: np.ndarray, boxes: list, path: str) -> None:
    from ragflow_ocr_spark.kernels import pngcodec

    with open(path, "wb") as f:
        f.write(pngcodec.encode_png(draw_boxes(img, boxes)))
