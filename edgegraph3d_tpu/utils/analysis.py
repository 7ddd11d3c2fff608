"""Analysis and sanity-check utilities.

Equivalents of the reference's inspection helpers:
  * find_edgerefpoints — count/flag refpoints whose observations lie
    near 2D edges on enough views (reference:
    src/edgegraph3d/utils/plg_analysis_utilities.cpp:52-79,
    MAX_EDGEREFPOINT_DIST include/.../plg_analysis_utilities.hpp:43)
  * test_reprojection / test_refpoint_projections — compare a point's
    stored observations with its reprojections (reference:
    src/edgegraph3d/utils/test_utilities.cpp:40-54)
"""

from __future__ import annotations

import numpy as np

from edgegraph3d_tpu.core.sfm import SfMData
from edgegraph3d_tpu.plgs.polyline_graph import PLGStack

#: reference: plg_analysis_utilities.hpp:43 MAX_EDGEREFPOINT_DIST
MAX_EDGEREFPOINT_DIST = 2.0


def _min_dist_to_plg(stack: PLGStack, view: int, pt: np.ndarray) -> float:
    """Exact min distance from `pt` to any segment of the view's PLG."""
    best = np.inf
    for p in np.flatnonzero(stack.valid[view]):
        c = stack.coords[view, p, : stack.length[view, p]]
        a, b = c[:-1], c[1:]
        ab = b - a
        denom = np.maximum((ab * ab).sum(-1), 1e-12)
        t = np.clip(((pt - a) * ab).sum(-1) / denom, 0.0, 1.0)
        proj = a + t[:, None] * ab
        d = np.sqrt(((proj - pt) ** 2).sum(-1)).min()
        best = min(best, float(d))
    return best


def find_edgerefpoints(sfmd: SfMData, stack: PLGStack,
                       max_dist: float = MAX_EDGEREFPOINT_DIST,
                       min_views: int = 2) -> np.ndarray:
    """Boolean [N] mask of refpoints lying within `max_dist` of an edge
    polyline on at least `min_views` of their viewing cams (parity:
    find_edgerefpoints, plg_analysis_utilities.cpp:52-79)."""
    out = np.zeros(sfmd.n_points, dtype=bool)
    for n in range(sfmd.n_points):
        close = 0
        for c, xy in zip(sfmd.obs_cam[n],
                         np.asarray(sfmd.obs_xy[n]).reshape(-1, 2)):
            if _min_dist_to_plg(stack, int(c), xy) <= max_dist:
                close += 1
            if close >= min_views:
                out[n] = True
                break
    return out


def reprojection_errors(sfmd: SfMData, point_id: int) -> np.ndarray:
    """Per-observation reprojection error [px] of one point (parity:
    test_reprojection, test_utilities.cpp:40-47)."""
    X = np.append(sfmd.points[point_id], 1.0)
    errs = []
    for c, xy in zip(sfmd.obs_cam[point_id],
                     np.asarray(sfmd.obs_xy[point_id]).reshape(-1, 2)):
        ph = sfmd.P[int(c)] @ X
        proj = ph[:2] / ph[2]
        errs.append(float(np.linalg.norm(proj - xy)))
    return np.asarray(errs)


def test_refpoint_projections(sfmd: SfMData, point_id: int,
                              verbose: bool = True) -> float:
    """Max reprojection error of a refpoint; prints the comparison when
    verbose (parity: test_refpoint_projections, test_utilities.cpp:49-54).
    """
    errs = reprojection_errors(sfmd, point_id)
    if verbose:
        for k, c in enumerate(sfmd.obs_cam[point_id]):
            print(f"point {point_id} cam {int(c)}: err {errs[k]:.3f} px")
    return float(errs.max(initial=0.0))


def reprojection_report(sfmd: SfMData, first_point: int = 0) -> dict:
    """Aggregate reprojection statistics over points [first_point:]."""
    all_errs = [reprojection_errors(sfmd, i)
                for i in range(first_point, sfmd.n_points)]
    flat = np.concatenate([e for e in all_errs if len(e)]) \
        if all_errs else np.zeros(0)
    return {
        "n_points": sfmd.n_points - first_point,
        "n_observations": int(flat.size),
        "mean_px": float(flat.mean()) if flat.size else 0.0,
        "median_px": float(np.median(flat)) if flat.size else 0.0,
        "max_px": float(flat.max()) if flat.size else 0.0,
    }
