"""Host (numpy) golden reference for stroke rasterization.

Re-implements, from the algorithm definition, the exact pixel semantics of
the reference pipeline `batch_rasterize_relative` (reference
`semiSupervised_utils/rasterize.py:152-205`):

  stroke-5 -> stroke-3 (`to_normal_strokes`, rasterize.py:154-167)
  -> absolute points, min/max range-normalized into [30, 225]
     (`to_stroke_list`, rasterize.py:170-191)
  -> per-stroke Bresenham line drawing onto a 256x256 canvas, skipping
     pixels with x==0 or y==0 (`mydrawPNG_from_list`, rasterize.py:131-149)
  -> scipy-style binary dilation (4-connected cross) * 255.

The Bresenham pixel set is the classic integer midpoint algorithm (identical
to the `bresenham` pip package the reference imports). This module is the
exact-match test oracle for the TPU kernel and is also usable directly in a
host data pipeline.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

CANVAS = 256
LO, HI = 30.0, 225.0  # range normalization targets (rasterize.py:179-180)


def bresenham_points(x0: int, y0: int, x1: int, y1: int) -> List[Tuple[int, int]]:
    """Classic integer Bresenham; includes both endpoints."""
    dx, dy = x1 - x0, y1 - y0
    xsign = 1 if dx > 0 else -1
    ysign = 1 if dy > 0 else -1
    dx, dy = abs(dx), abs(dy)
    if dx > dy:
        xx, xy, yx, yy = xsign, 0, 0, ysign
    else:
        dx, dy = dy, dx
        xx, xy, yx, yy = 0, ysign, xsign, 0
    d = 2 * dy - dx
    y = 0
    pts = []
    for x in range(dx + 1):
        pts.append((x0 + x * xx + y * yx, y0 + x * xy + y * yy))
        if d >= 0:
            y += 1
            d -= 2 * dx
        d += 2 * dy
    return pts


def stroke5_to_stroke3(big_stroke: np.ndarray) -> np.ndarray:
    """Stroke-5 -> stroke-3 truncated at the end token (rasterize.py:154-167)."""
    l = 0
    for i in range(len(big_stroke)):
        if big_stroke[i, 4] > 0:
            l = i
            break
    if l == 0:
        l = len(big_stroke) - 1
    result = np.zeros((l + 1, 3))
    result[:, 0:2] = big_stroke[: l + 1, 0:2]
    result[:, 2] = big_stroke[: l + 1, 3]
    result[-1, -1] = 1.0
    return result


def stroke3_to_points(sketch3: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Relative stroke-3 -> absolute int points normalized into [30, 225].

    Returns (points (N, 2) int64, pen (N,) — pen[i]==1 means the stroke ends
    at point i). Mirrors `to_stroke_list` (rasterize.py:170-191) with the
    origin row prepended and float64 scaling before the int cast.
    """
    sketch = np.vstack((np.array([0.0, 0.0, 0.0]), sketch3)).astype(np.float64)
    sketch[:, :2] = np.cumsum(sketch[:, :2], axis=0)
    xmin, xmax = sketch[:, 0].min(), sketch[:, 0].max()
    ymin, ymax = sketch[:, 1].min(), sketch[:, 1].max()
    sketch[:, 0] = (sketch[:, 0] - xmin) / float(xmax - xmin) * (HI - LO) + LO
    sketch[:, 1] = (sketch[:, 1] - ymin) / float(ymax - ymin) * (HI - LO) + LO
    pts = sketch[:, :2].astype(np.int64)
    pen = sketch[:, 2].astype(np.int64)
    return pts, pen


def draw_points(points: np.ndarray, pen: np.ndarray, side: int = CANVAS) -> np.ndarray:
    """Bresenham-draw segments between consecutive same-stroke points.

    Matches `mydrawPNG_from_list` (rasterize.py:131-149): a segment exists
    from point i to i+1 iff pen[i] == 0; written pixels require x > 0 and
    y > 0 (pixels on row/column zero are skipped by the reference bound
    check `cord[0] > 0 and cord[1] > 0`).
    """
    canvas = np.zeros((side, side), dtype=np.float32)
    for i in range(len(points) - 1):
        if pen[i] != 0:
            continue
        for x, y in bresenham_points(
            int(points[i, 0]), int(points[i, 1]), int(points[i + 1, 0]), int(points[i + 1, 1])
        ):
            if 0 < x < side and 0 < y < side:
                canvas[y, x] = 255.0
    return canvas


def binary_dilate_cross_np(canvas: np.ndarray) -> np.ndarray:
    """scipy.ndimage.binary_dilation default structure, zero border."""
    m = canvas > 0
    out = m.copy()
    out[1:, :] |= m[:-1, :]
    out[:-1, :] |= m[1:, :]
    out[:, 1:] |= m[:, :-1]
    out[:, :-1] |= m[:, 1:]
    return out


def rasterize_stroke5_np(stroke5: np.ndarray) -> np.ndarray:
    """Full reference pipeline for one stroke-5 sketch -> (256, 256) 0/255."""
    s3 = stroke5_to_stroke3(np.asarray(stroke5))
    pts, pen = stroke3_to_points(s3)
    canvas = draw_points(pts, pen)
    return binary_dilate_cross_np(canvas).astype(np.float32) * 255.0


def rasterize_stroke3_np(stroke3: np.ndarray) -> np.ndarray:
    """Reference pipeline from stroke-3 (QuickDraw .npz style) input."""
    pts, pen = stroke3_to_points(np.asarray(stroke3))
    canvas = draw_points(pts, pen)
    return binary_dilate_cross_np(canvas).astype(np.float32) * 255.0


def batch_rasterize_relative_np(batch: np.ndarray) -> np.ndarray:
    """(B, T, 5) or (B, T, 3) -> (B, 256, 256) float 0/255."""
    fn = rasterize_stroke5_np if batch.shape[-1] == 5 else rasterize_stroke3_np
    return np.stack([fn(s) for s in batch])
