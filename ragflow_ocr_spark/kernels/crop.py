"""Perspective crop + tall-crop rotation probe.

- ``get_rotate_crop_image`` — semantics of the reference function of
  the same name (``/root/reference/ocr/ocr.py:411-440``): 4-point
  perspective warp to a rectangle sized by the quad's edge norms. The
  reference handles tall results (h/w ≥ 1.5) ONLY via the probe below
  (inlined there at ``ocr.py:443-464``) — there is no unconditional
  rotate; the caller composes crop + probe to the same effect.
- ``rotation_probe`` — the reference's best-of-three-rotations trick
  for tall crops (``/root/reference/ocr/ocr.py:441-464``), including
  its quirk: the counter-clockwise branch updates best_img on a win
  but never best_score (harmless as the last branch — replicated
  verbatim, SURVEY.md §7 hard-part 2).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

from ragflow_ocr_spark.kernels.imgeom import perspective_matrix, warp_perspective


def get_rotate_crop_image(img: np.ndarray, points: np.ndarray) -> np.ndarray:
    """img HWC/HW, points (4,2) TL,TR,BR,BL → cropped patch float32."""
    pts = points.astype(np.float64)
    img_crop_width = int(
        max(
            np.linalg.norm(pts[0] - pts[1]),
            np.linalg.norm(pts[2] - pts[3]),
        )
    )
    img_crop_height = int(
        max(
            np.linalg.norm(pts[0] - pts[3]),
            np.linalg.norm(pts[1] - pts[2]),
        )
    )
    img_crop_width = max(img_crop_width, 1)
    img_crop_height = max(img_crop_height, 1)
    # Axis-aligned integer quad (the overwhelmingly common case for
    # horizontal text boxes) → the exact perspective warp is the
    # identity translation (i,j) → (x0+i, y0+j): bilinear sampling at
    # integer coordinates reads single pixels, so a direct slice IS
    # the mathematically exact warp, skipping the 8x8 solve + full
    # inverse-map grid (~the crop stage's whole cost). In-bounds
    # requirement keeps the border-replicate path on the warp.
    x0, y0 = pts[0]
    if (
        pts[0, 1] == pts[1, 1]
        and pts[2, 1] == pts[3, 1]
        and pts[0, 0] == pts[3, 0]
        and pts[1, 0] == pts[2, 0]
        and x0 == int(x0)
        and y0 == int(y0)
        and pts[1, 0] - x0 == img_crop_width
        and pts[3, 1] - y0 == img_crop_height
        and x0 >= 0
        and y0 >= 0
        and x0 + img_crop_width <= img.shape[1]
        and y0 + img_crop_height <= img.shape[0]
    ):
        xi, yi = int(x0), int(y0)
        return img[
            yi : yi + img_crop_height, xi : xi + img_crop_width
        ].astype(np.float32)
    dst = np.array(
        [
            [0, 0],
            [img_crop_width, 0],
            [img_crop_width, img_crop_height],
            [0, img_crop_height],
        ],
        dtype=np.float64,
    )
    m = perspective_matrix(pts, dst)
    return warp_perspective(img, m, img_crop_width, img_crop_height)


def rotation_probe(
    crop: np.ndarray,
    rec_one: Callable[[np.ndarray], tuple[str, float]],
) -> np.ndarray:
    """For tall crops try 0°, +90° (cw), +270° (ccw); keep the image
    whose rec score wins. ``rec_one`` recognizes a single crop.

    Quirk preserved: the ccw branch updates best_img without updating
    best_score (``/root/reference/ocr/ocr.py:457-461``).
    """
    h, w = crop.shape[:2]
    if h * 1.0 / max(w, 1) < 1.5:
        return crop
    best_img = crop
    _, best_score = rec_one(crop)
    cw = np.rot90(crop, k=-1)
    _, s_cw = rec_one(cw)
    if s_cw > best_score:
        best_img = cw
        best_score = s_cw
    ccw = np.rot90(crop, k=1)
    _, s_ccw = rec_one(ccw)
    if s_ccw > best_score:
        best_img = ccw  # note: best_score deliberately NOT updated
    return best_img
