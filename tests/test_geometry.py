"""Geometry kernel tests (SURVEY.md §7 step 2): projection, F-matrices,
epipolar lines, DLT triangulation, batched Gauss-Newton."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgegraph3d_tpu.core import sfm, synthetic
from edgegraph3d_tpu.ops import geometry, triangulation


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(n_cams=8, n_refpoints_per_curve=16,
                                width=320, height_px=240, focal=400.0,
                                seed=1)


def packed(scene_tuple, noise=0.0, seed=0):
    sfmd, _, _ = scene_tuple
    p = sfm.pack_observations(sfmd.obs_cam, sfmd.obs_xy, max_obs=8)
    xy = p.xy
    if noise:
        rng = np.random.default_rng(seed)
        xy = xy + rng.normal(0, noise, xy.shape).astype(xy.dtype) * p.mask[..., None]
    P = sfmd.P.astype(np.float32)
    P_obs = P[np.clip(p.cam_idx, 0, None)]
    return sfmd, p, P_obs.astype(np.float32), xy.astype(np.float32)


def test_project_matches_host(scene):
    sfmd, _, _ = scene
    X = sfmd.points
    xy_host, front = synthetic.project_points(sfmd, X)
    xy_dev = geometry.project(jnp.asarray(sfmd.P)[:, None],
                              jnp.asarray(X)[None, :])
    # f32 inputs: sub-millipixel agreement expected
    np.testing.assert_allclose(np.asarray(xy_dev), xy_host, atol=1e-3)


def test_fundamental_from_cameras_epipolar_constraint(scene):
    sfmd, _, _ = scene
    F = geometry.all_fundamental_matrices(jnp.asarray(sfmd.P),
                                          jnp.asarray(sfmd.center))
    F = np.asarray(F)
    # for every refpoint observed in views i and j: dist(x_j, F_ij x_i) = 0
    Fs, xa, xb = [], [], []
    for pid in range(sfmd.n_points):
        cams = sfmd.obs_cam[pid]
        xys = sfmd.obs_xy[pid]
        for a in range(len(cams)):
            for b in range(len(cams)):
                if a != b:
                    Fs.append(F[cams[a], cams[b]])
                    xa.append(xys[a])
                    xb.append(xys[b])
    lines = geometry.epipolar_line(jnp.asarray(np.array(Fs)),
                                   jnp.asarray(np.array(xa)))
    d = geometry.point_line_distance(lines, jnp.asarray(np.array(xb)))
    assert float(jnp.max(jnp.abs(d))) < 1e-3  # px


def test_fundamental_8point(scene):
    sfmd, _, _ = scene
    # correspondences of refpoints seen in cams 0 and 1
    x1, x2 = [], []
    for pid in range(sfmd.n_points):
        cams = list(sfmd.obs_cam[pid])
        if 0 in cams and 1 in cams:
            x1.append(sfmd.obs_xy[pid][cams.index(0)])
            x2.append(sfmd.obs_xy[pid][cams.index(1)])
    x1 = jnp.asarray(np.array(x1))
    x2 = jnp.asarray(np.array(x2))
    assert x1.shape[0] >= 10
    mask = jnp.ones(x1.shape[0], dtype=bool)
    F, valid = geometry.fundamental_8point(x1, x2, mask)
    assert bool(valid)
    d2 = geometry._sampson_sq(F, x1, x2)
    assert float(jnp.max(d2)) < 1e-2


def test_fundamental_lmeds_robust_to_outliers(scene):
    sfmd, _, _ = scene
    x1, x2 = [], []
    for pid in range(sfmd.n_points):
        cams = list(sfmd.obs_cam[pid])
        if 0 in cams and 2 in cams:
            x1.append(sfmd.obs_xy[pid][cams.index(0)])
            x2.append(sfmd.obs_xy[pid][cams.index(2)])
    x1 = np.array(x1)
    x2 = np.array(x2)
    rng = np.random.default_rng(0)
    n_out = len(x1) // 5
    idx = rng.choice(len(x1), n_out, replace=False)
    x2[idx] += rng.uniform(30, 80, (n_out, 2))  # 20% gross outliers
    mask = jnp.ones(len(x1), dtype=bool)
    F, valid = geometry.fundamental_lmeds(
        jnp.asarray(x1), jnp.asarray(x2), mask, jax.random.key(0))
    assert bool(valid)
    d2 = np.asarray(geometry._sampson_sq(F, jnp.asarray(x1), jnp.asarray(x2)))
    inlier_d = np.delete(d2, idx)
    assert np.median(inlier_d) < 0.5  # px^2 on the clean 80%


def test_fundamental_lmeds_too_few_points():
    x = jnp.zeros((5, 2))
    mask = jnp.ones(5, dtype=bool)
    _, valid = geometry.fundamental_lmeds(x, x, mask, jax.random.key(0),
                                          n_subsets=4)
    assert not bool(valid)  # parity: needs >=10 common points


def test_epipolar_line_normalized(scene):
    sfmd, _, _ = scene
    F = geometry.all_fundamental_matrices(jnp.asarray(sfmd.P),
                                          jnp.asarray(sfmd.center))
    l = geometry.epipolar_line(F[0, 1], jnp.asarray([100.0, 120.0]))
    assert abs(float(l[0] ** 2 + l[1] ** 2) - 1.0) < 1e-6


def test_triangulate_dlt_exact(scene):
    sfmd, p, P_obs, xy = packed(scene)
    X = triangulation.triangulate_dlt(jnp.asarray(P_obs), jnp.asarray(xy),
                                      jnp.asarray(p.mask))
    err = np.linalg.norm(np.asarray(X) - sfmd.points, axis=1)
    assert np.median(err) < 1e-3
    assert np.max(err) < 5e-2


def test_triangulate_pair_minmax(scene):
    sfmd, p, P_obs, xy = packed(scene)
    X = triangulation.triangulate_pair_minmax(
        jnp.asarray(P_obs), jnp.asarray(xy),
        jnp.asarray(p.cam_idx), jnp.asarray(p.mask))
    err = np.linalg.norm(np.asarray(X) - sfmd.points, axis=1)
    assert np.median(err) < 1e-2


def test_gauss_newton_refines_noisy_points(scene):
    sfmd, p, P_obs, xy = packed(scene, noise=0.5, seed=2)
    X, mse, valid = triangulation.estimate_3d_positions(
        jnp.asarray(P_obs), jnp.asarray(xy),
        jnp.asarray(p.cam_idx), jnp.asarray(p.mask),
        accept_mse=9.0)
    X, mse, valid = map(np.asarray, (X, mse, valid))
    assert valid.mean() > 0.9
    err = np.linalg.norm(X[valid] - sfmd.points[valid], axis=1)
    assert np.median(err) < 0.02
    assert (mse[valid] < 9.0).all()


def test_gauss_newton_rejects_bad_points(scene):
    sfmd, p, P_obs, xy = packed(scene)
    # corrupt one observation of each point by 50 px -> high mse
    xy_bad = np.asarray(xy).copy()
    xy_bad[:, 0, :] += 50.0
    X, mse, valid = triangulation.estimate_3d_positions(
        jnp.asarray(P_obs), jnp.asarray(xy_bad),
        jnp.asarray(p.cam_idx), jnp.asarray(p.mask),
        accept_mse=9.0)
    assert np.asarray(valid).mean() < 0.2


def test_gauss_newton_accept_threshold_filters():
    """accept_mse=2.25 (filter) is stricter than 9 (matching)."""
    sfmd, _, _ = synthetic.make_scene(n_cams=8, n_refpoints_per_curve=16,
                                      width=320, height_px=240,
                                      focal=400.0, noise_px=1.2, seed=5)
    p = sfm.pack_observations(sfmd.obs_cam, sfmd.obs_xy, max_obs=8)
    P_obs = sfmd.P.astype(np.float32)[np.clip(p.cam_idx, 0, None)]
    args = (jnp.asarray(P_obs), jnp.asarray(p.xy),
            jnp.asarray(p.cam_idx), jnp.asarray(p.mask))
    _, _, v_match = triangulation.estimate_3d_positions(*args, accept_mse=9.0)
    _, _, v_filter = triangulation.estimate_3d_positions(*args, accept_mse=2.25)
    assert np.asarray(v_filter).sum() <= np.asarray(v_match).sum()


def test_reprojection_mse(scene):
    sfmd, p, P_obs, xy = packed(scene)
    mse = triangulation.reprojection_mse(
        jnp.asarray(P_obs), jnp.asarray(xy), jnp.asarray(p.mask),
        jnp.asarray(sfmd.points.astype(np.float32)))
    assert float(jnp.max(mse)) < 1e-2
