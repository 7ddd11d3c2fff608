"""Coordinate-system similarity transform (Umeyama).

Parity: src/coordinate_system_transform/transform_coordinate_system.cpp:93-148 —
compute the similarity transform aligning the SfM camera centers onto
target camera positions (`Eigen::umeyama` equivalent), excluding null
(all-zero) cameras, then apply it to points and cameras.
"""

from __future__ import annotations

import numpy as np

from edgegraph3d_tpu.core.sfm import SfMData


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform: dst ~ c R src + t.

    Returns (c, R [3,3], t [3]).  (Umeyama, TPAMI 1991 — the algorithm
    behind Eigen::umeyama.)"""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (sc ** 2).sum() / len(src)
    c = float(np.trace(np.diag(D) @ S) / var_s) if with_scale else 1.0
    t = mu_d - c * R @ mu_s
    return c, R, t


def read_camera_poses(path: str) -> np.ndarray:
    """Target camera positions file: one 'x y z' line per camera
    (parity: example/dtu006/target_camera_poses.txt format)."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 3:
                rows.append([float(v) for v in parts[:3]])
    return np.asarray(rows)


def transform_coordinate_system(sfmd: SfMData, target_centers: np.ndarray,
                                exclude_null_cameras: bool = True) -> SfMData:
    """Align the scene onto `target_centers` (parity:
    compute_transformation[_exclude_nullCamera] + application,
    transform_coordinate_system.cpp:93-148)."""
    src = sfmd.center
    dst = np.asarray(target_centers)[: len(src)]
    sel = np.arange(len(src))
    if exclude_null_cameras:
        nz = ~(np.all(np.abs(dst) < 1e-12, axis=1))
        sel = np.flatnonzero(nz)
    c, R, t = umeyama(src[sel], dst[sel])

    out = sfmd.copy()
    out.points = (c * (R @ sfmd.points.T)).T + t
    out.center = (c * (R @ sfmd.center.T)).T + t
    # world rotation W -> W' = R W: camera rotation R_cam' = R_cam R^T
    out.R = np.einsum("cij,kj->cik", sfmd.R, R)
    out.t = -np.einsum("cij,cj->ci", out.R, out.center)
    return out
