"""Incremental observation-add and view-subset triangulation
(parity targets: em_add_new_observation_to_3Dpositions,
triangulation.cpp:347-466; compute_3d_point_coords_combinations,
triangulation.cpp:1105-1158), plus MatchesManager checkpointing and
transform_plgs."""

import jax.numpy as jnp
import numpy as np
import pytest

from edgegraph3d_tpu.core import sfm, synthetic
from edgegraph3d_tpu.ops import triangulation


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(n_cams=8, n_refpoints_per_curve=16,
                                width=320, height_px=240, focal=400.0,
                                seed=1)


def packed(scene_tuple):
    sfmd, _, _ = scene_tuple
    p = sfm.pack_observations(sfmd.obs_cam, sfmd.obs_xy, max_obs=8)
    P = sfmd.P.astype(np.float32)
    P_obs = P[np.clip(p.cam_idx, 0, None)].astype(np.float32)
    return sfmd, p, P_obs, p.xy.astype(np.float32)


def test_add_observation_improves_and_accepts(scene):
    sfmd, p, P_obs, xy = packed(scene)
    # hold out each point's last valid observation, solve, then add it
    n_obs = p.mask.sum(axis=1)
    pts = np.where(n_obs >= 4)[0][:16]
    last = n_obs[pts] - 1
    mask = p.mask[pts].copy()
    mask[np.arange(len(pts)), last] = False
    X0, mse0, ok0 = triangulation.estimate_3d_positions(
        jnp.asarray(P_obs[pts]), jnp.asarray(xy[pts]),
        jnp.asarray(p.cam_idx[pts]), jnp.asarray(mask))
    new_P = P_obs[pts, last]
    new_xy = xy[pts, last]
    X1, mse1, ok1, mask1 = triangulation.add_observation_to_3d_points(
        jnp.asarray(P_obs[pts]), jnp.asarray(xy[pts]), jnp.asarray(mask),
        X0, jnp.asarray(new_P), jnp.asarray(new_xy))
    assert bool(jnp.all(ok1))
    # the new observation landed in the held-out slot's place
    assert int(jnp.sum(mask1)) == int(mask.sum()) + len(pts)
    np.testing.assert_allclose(np.asarray(X1), sfmd.points[pts], atol=1e-2)


def test_add_observation_respects_new_valid(scene):
    sfmd, p, P_obs, xy = packed(scene)
    pts = np.where(p.mask.sum(axis=1) >= 4)[0][:4]
    mask = p.mask[pts].copy()
    mask[:, -1] = False   # guarantee a free slot
    X0 = jnp.asarray(sfmd.points[pts], jnp.float32)
    nv = jnp.array([True, False, True, False])
    _, _, _, mask1 = triangulation.add_observation_to_3d_points(
        jnp.asarray(P_obs[pts]), jnp.asarray(xy[pts]), jnp.asarray(mask),
        X0, jnp.asarray(P_obs[pts, 0]), jnp.asarray(xy[pts, 0]),
        new_valid=nv)
    added = np.asarray(jnp.sum(mask1, axis=1)) - mask.sum(axis=1)
    np.testing.assert_array_equal(added, [1, 0, 1, 0])


def test_view_combinations_rejects_outlier_view(scene):
    sfmd, p, P_obs, xy = packed(scene)
    i = int(np.where(p.mask.sum(axis=1) >= 5)[0][0])
    n = int(p.mask[i].sum())
    xy_bad = xy[i].copy()
    xy_bad[n - 1] += 80.0     # corrupt one observation
    X, mse, ok, used = triangulation.triangulate_view_combinations(
        jnp.asarray(P_obs[i]), jnp.asarray(xy_bad), jnp.asarray(p.mask[i]))
    assert bool(ok)
    assert not bool(used[n - 1])          # outlier view dropped
    assert int(jnp.sum(used)) >= n - 1 - 1
    np.testing.assert_allclose(np.asarray(X), sfmd.points[i], atol=5e-2)
    assert float(mse) < 9.0


def test_view_combinations_clean_uses_all(scene):
    sfmd, p, P_obs, xy = packed(scene)
    i = int(np.where(p.mask.sum(axis=1) >= 4)[0][1])
    X, mse, ok, used = triangulation.triangulate_view_combinations(
        jnp.asarray(P_obs[i]), jnp.asarray(xy[i]), jnp.asarray(p.mask[i]))
    assert bool(ok)
    assert int(jnp.sum(used)) == int(p.mask[i].sum())
    np.testing.assert_allclose(np.asarray(X), sfmd.points[i], atol=1e-2)


def test_matches_manager_save_load(tmp_path):
    from edgegraph3d_tpu.matching.matches import MatchesManager

    lengths = np.array([[8, 5, 0], [3, 7, 2]], np.int32)
    mm = MatchesManager(lengths, buckets=16)
    mm.mark_points(np.array([0, 1]), np.array([1, 0]),
                   np.array([2, 1]), np.array([0.5, 0.0]))
    path = str(tmp_path / "plgmm.npz")
    mm.save(path)
    mm2 = MatchesManager.load(path)
    np.testing.assert_array_equal(mm.raster, mm2.raster)
    np.testing.assert_array_equal(mm.lengths, mm2.lengths)
    assert mm2.B == 16


def test_transform_plgs_roundtrip():
    from edgegraph3d_tpu.plgs.plg_io import transform_plgs
    from edgegraph3d_tpu.plgs.polyline_graph import (from_polyline_list,
                                                     stack_plgs)

    # a noisy straight chain (simplifiable) + a short stub
    t = np.linspace(0, 20, 21)
    wig = np.stack([t, 0.2 * np.sin(t)], axis=1).astype(np.float32)
    stub = np.array([[40, 40], [41, 40], [42, 40]], np.float32)
    plg = from_polyline_list([wig, stub], max_polylines=8, max_len=32)
    stack = stack_plgs([plg], max_polylines=8, max_len=32)
    out = transform_plgs(stack)
    # shapes are data-derived pow2 buckets (stack_plgs): the transform
    # may SHRINK the L bucket after simplification, never grow past it
    assert out.coords.shape[:2] == stack.coords.shape[:2]
    assert out.coords.shape[2] <= stack.coords.shape[2]
    assert int((out.length >= 2).sum()) >= 1
    # simplification shortened the wiggly chain's coord count
    assert int(out.length.max()) <= int(stack.length.max())
