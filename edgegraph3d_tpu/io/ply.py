"""PLY point-cloud output.

Parity: src/edgegraph3d/io/output/output_point_cloud.cpp:127-260 —
ascii PLY; the colored variant paints each point with the mean of the
subpixel image samples over its observing views.
"""

from __future__ import annotations

import numpy as np

from edgegraph3d_tpu.core.sfm import SfMData


def write_ply(points: np.ndarray, path: str,
              colors: np.ndarray | None = None) -> None:
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            xyz = " ".join(f"{v:.6f}" for v in points[i])
            if colors is not None:
                rgb = " ".join(str(int(v)) for v in colors[i])
                f.write(f"{xyz} {rgb}\n")
            else:
                f.write(f"{xyz}\n")


def _bilinear(img: np.ndarray, xy: np.ndarray) -> np.ndarray:
    """Subpixel sample of [H,W,3] at xy (x=col, y=row)."""
    h, w = img.shape[:2]
    x = np.clip(xy[0], 0, w - 1.001)
    y = np.clip(xy[1], 0, h - 1.001)
    x0, y0 = int(x), int(y)
    fx, fy = x - x0, y - y0
    p = (img[y0, x0] * (1 - fx) * (1 - fy)
         + img[y0, x0 + 1] * fx * (1 - fy)
         + img[y0 + 1, x0] * (1 - fx) * fy
         + img[y0 + 1, x0 + 1] * fx * fy)
    return p


def point_colors(sfmd: SfMData, images: list[np.ndarray]) -> np.ndarray:
    """Mean subpixel color over observing views (parity:
    output_colored_point_cloud, output_point_cloud.cpp:191-260)."""
    colors = np.zeros((sfmd.n_points, 3))
    for i in range(sfmd.n_points):
        samples = [
            _bilinear(images[int(c)], np.asarray(xy))
            for c, xy in zip(sfmd.obs_cam[i],
                             np.asarray(sfmd.obs_xy[i]).reshape(-1, 2))
            if int(c) < len(images) and images[int(c)] is not None]
        if samples:
            colors[i] = np.mean(samples, axis=0)
    return np.clip(colors, 0, 255).astype(np.uint8)


def output_point_cloud(sfmd: SfMData, path: str,
                       images: list[np.ndarray] | None = None) -> None:
    colors = point_colors(sfmd, images) if images else None
    write_ply(sfmd.points, path, colors)
