"""Unit tests for the numpy geometry primitives (cv2 replacements)."""

from __future__ import annotations

import numpy as np
import pytest

from ragflow_ocr_spark.kernels.imgeom import (
    clip_quad,
    connected_components,
    convex_hull,
    min_area_rect,
    order_points_clockwise,
    perspective_matrix,
    quad_mask_mean,
    resize_bilinear,
    unclip_quad,
    warp_perspective,
)


def test_resize_identity():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = resize_bilinear(img, 3, 4)
    assert np.allclose(out, img)


def test_resize_downscale_mean():
    img = np.zeros((4, 4), dtype=np.uint8)
    img[:2] = 100
    out = resize_bilinear(img, 2, 2)
    assert out.shape == (2, 2)
    assert out[0, 0] > out[1, 0]


def test_resize_rgb_shape():
    img = np.random.default_rng(0).integers(0, 255, (32, 48, 3)).astype(np.uint8)
    out = resize_bilinear(img, 16, 24)
    assert out.shape == (16, 24, 3)


def test_perspective_identity():
    src = np.array([[0, 0], [10, 0], [10, 5], [0, 5]], dtype=np.float64)
    m = perspective_matrix(src, src)
    assert np.allclose(m, np.eye(3), atol=1e-9)


def test_warp_translation():
    img = np.zeros((10, 10), dtype=np.float32)
    img[2:4, 3:5] = 1.0
    src = np.array([[3, 2], [5, 2], [5, 4], [3, 4]], dtype=np.float64)
    dst = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=np.float64)
    m = perspective_matrix(src, dst)
    out = warp_perspective(img, m, 2, 2)
    assert out.mean() > 0.8


def test_convex_hull_square():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3]])
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert set(map(tuple, hull.astype(int))) == {(0, 0), (4, 0), (4, 4), (0, 4)}


def test_min_area_rect_axis_aligned():
    pts = np.array([[1, 1], [9, 1], [9, 4], [1, 4]])
    box, sside = min_area_rect(pts)
    assert sside == pytest.approx(3.0)
    # TL, TR, BR, BL ordering
    assert box[0].tolist() == [1, 1]
    assert box[2].tolist() == [9, 4]


def test_min_area_rect_rotated():
    # 45° diamond: min rect is the rotated square
    pts = np.array([[5, 0], [10, 5], [5, 10], [0, 5]], dtype=np.float64)
    box, sside = min_area_rect(pts)
    assert sside == pytest.approx(np.hypot(5, 5), rel=1e-6)


def test_connected_components_two_blobs():
    m = np.zeros((10, 20), dtype=bool)
    m[1:3, 1:5] = True
    m[6:9, 10:15] = True
    regions = connected_components(m)
    assert len(regions) == 2
    # document order: top blob first
    assert regions[0][:, 1].min() == 1


def test_connected_components_diagonal_8conn():
    m = np.zeros((4, 4), dtype=bool)
    m[0, 0] = True
    m[1, 1] = True  # touches only diagonally
    assert len(connected_components(m)) == 1


def test_connected_components_max_regions():
    m = np.zeros((1, 20), dtype=bool)
    m[0, ::2] = True
    assert len(connected_components(m, max_regions=3)) == 3


def test_quad_mask_mean():
    prob = np.zeros((10, 10), dtype=np.float32)
    prob[2:5, 2:6] = 1.0
    quad = np.array([[2, 2], [5, 2], [5, 4], [2, 4]], dtype=np.float64)
    assert quad_mask_mean(prob, quad) == pytest.approx(1.0)


def test_unclip_grows_rectangle():
    quad = np.array([[0, 0], [20, 0], [20, 4], [0, 4]], dtype=np.float64)
    out = unclip_quad(quad, 1.5)
    # delta = area*ratio/perimeter = 80*1.5/48 = 2.5 per side
    w = out[:, 0].max() - out[:, 0].min()
    h = out[:, 1].max() - out[:, 1].min()
    assert w == pytest.approx(25.0)
    assert h == pytest.approx(9.0)


def test_order_points_clockwise():
    pts = np.array([[10, 10], [0, 0], [10, 0], [0, 10]], dtype=np.float64)
    out = order_points_clockwise(pts)
    assert out.tolist() == [[0, 0], [10, 0], [10, 10], [0, 10]]


def test_clip_quad():
    pts = np.array([[-5, 3], [100, 3], [100, 200], [-5, 200]], dtype=np.float64)
    out = clip_quad(pts, 50, 60)
    assert out[:, 0].min() == 0 and out[:, 0].max() == 59
    assert out[:, 1].max() == 49
