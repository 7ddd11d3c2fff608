"""Debug-image rendering.

Compact equivalent of the reference's drawing utilities
(reference: src/edgegraph3d/utils/drawing_utilities.cpp:53-1191 — PLGs
colored by polyline, reprojected output points, match visualizations;
saved under the working folder when `-i` is passed,
edge_matcher.cpp:89-96,138-143)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from edgegraph3d_tpu.core.sfm import SfMData
from edgegraph3d_tpu.plgs.polyline_graph import PLGStack

_PALETTE = np.asarray([
    [230, 80, 80], [80, 200, 90], [90, 120, 240], [240, 200, 70],
    [200, 90, 220], [80, 210, 210], [240, 140, 60], [150, 230, 90],
], dtype=np.uint8)


def _draw_line(img: np.ndarray, a, b, color) -> None:
    h, w = img.shape[:2]
    n = int(max(abs(b[0] - a[0]), abs(b[1] - a[1]))) + 2
    t = np.linspace(0.0, 1.0, n)
    xs = np.round(a[0] + (b[0] - a[0]) * t).astype(int)
    ys = np.round(a[1] + (b[1] - a[1]) * t).astype(int)
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[ok], xs[ok]] = color


def _draw_cross(img: np.ndarray, xy, color, r: int = 2) -> None:
    h, w = img.shape[:2]
    x, y = int(round(xy[0])), int(round(xy[1]))
    for d in range(-r, r + 1):
        if 0 <= y + d < h and 0 <= x < w:
            img[y + d, x] = color
        if 0 <= y < h and 0 <= x + d < w:
            img[y, x + d] = color


def draw_plgs(stack: PLGStack, width: int, height: int) -> np.ndarray:
    """[V,H,W,3] images of the polyline graphs, colored per polyline
    (parity: draw_plgs, drawing_utilities.hpp:185)."""
    V = stack.n_views
    out = np.zeros((V, height, width, 3), dtype=np.uint8)
    for v in range(V):
        for p in np.flatnonzero(stack.valid[v]):
            color = _PALETTE[p % len(_PALETTE)]
            c = stack.coords[v, p, : stack.length[v, p]]
            for k in range(len(c) - 1):
                _draw_line(out[v], c[k], c[k + 1], color)
    return out


def draw_sfmd_points(sfmd: SfMData, width: int, height: int,
                     first_point: int = 0) -> np.ndarray:
    """Reprojections of points [first_point:] on every view (parity:
    draw_sfmd_points*, drawing_utilities.hpp:251)."""
    V = sfmd.n_cameras
    out = np.zeros((V, height, width, 3), dtype=np.uint8)
    for i in range(first_point, sfmd.n_points):
        color = _PALETTE[i % len(_PALETTE)]
        for c, xy in zip(sfmd.obs_cam[i],
                         np.asarray(sfmd.obs_xy[i]).reshape(-1, 2)):
            _draw_cross(out[int(c)], xy, color)
    return out


def save_debug_images(sfmd: SfMData, folder: str,
                      stack: PLGStack | None = None,
                      first_edgepoint: int = 0) -> None:
    os.makedirs(folder, exist_ok=True)
    W = int(sfmd.widths.max())
    H = int(sfmd.heights.max())
    if stack is not None:
        for v, img in enumerate(draw_plgs(stack, W, H)):
            Image.fromarray(img).save(
                os.path.join(folder, f"plgs_imgs_{v:04d}.png"))
    for v, img in enumerate(draw_sfmd_points(sfmd, W, H, first_edgepoint)):
        Image.fromarray(img).save(
            os.path.join(folder, f"output_on_imgs_{v:04d}.png"))
