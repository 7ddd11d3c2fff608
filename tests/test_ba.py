"""Bundle-adjustment tests: single-device and 8-device CPU mesh parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgegraph3d_tpu.core import sfm, synthetic
from edgegraph3d_tpu.ops import ba as ba_ops
from edgegraph3d_tpu.parallel import mesh as mesh_mod
from edgegraph3d_tpu.parallel import sharded


@pytest.fixture(scope="module")
def ba_problem():
    sfmd, _, _ = synthetic.make_scene(n_cams=8, n_refpoints_per_curve=16,
                                      width=320, height_px=240,
                                      focal=400.0, seed=5)
    packed = sfm.pack_observations(sfmd.obs_cam, sfmd.obs_xy, max_obs=8,
                                   dtype=np.float32)
    rng = np.random.default_rng(0)
    # perturb points and camera poses; BA must recover
    X0 = sfmd.points + rng.normal(0, 0.01, sfmd.points.shape)
    w = rng.normal(0, 0.002, (sfmd.n_cameras, 3))
    R0 = np.asarray(ba_ops.exp_so3(jnp.asarray(w))) @ sfmd.R
    t0 = sfmd.t + rng.normal(0, 0.005, sfmd.t.shape)
    state = ba_ops.BAState(
        K=jnp.asarray(sfmd.K, jnp.float32),
        R=jnp.asarray(R0, jnp.float32),
        t=jnp.asarray(t0, jnp.float32),
        X=jnp.asarray(X0, jnp.float32))
    return sfmd, state, packed


def test_ba_residual_decreases(ba_problem):
    sfmd, state, packed = ba_problem
    args = (jnp.asarray(packed.cam_idx), jnp.asarray(packed.xy),
            jnp.asarray(packed.mask))
    mse0 = float(ba_ops.ba_mse(state, *args))
    st = state
    for _ in range(8):
        st, mse = ba_ops.ba_step_single(st, *args, damping=1e-4)
    mse_end = float(ba_ops.ba_mse(st, *args))
    assert mse0 > 0.1            # perturbation produced real error
    assert mse_end < mse0 * 1e-2  # >100x reduction


def test_ba_points_only_matches_gn(ba_problem):
    """With cameras exact, BA point updates should reach GN accuracy."""
    sfmd, _, packed = ba_problem
    rng = np.random.default_rng(1)
    X0 = sfmd.points + rng.normal(0, 0.02, sfmd.points.shape)
    state = ba_ops.BAState(
        K=jnp.asarray(sfmd.K, jnp.float32),
        R=jnp.asarray(sfmd.R, jnp.float32),
        t=jnp.asarray(sfmd.t, jnp.float32),
        X=jnp.asarray(X0, jnp.float32))
    args = (jnp.asarray(packed.cam_idx), jnp.asarray(packed.xy),
            jnp.asarray(packed.mask))
    st = state
    for _ in range(6):
        st, _ = ba_ops.ba_step_single(st, *args, damping=1e-6)
    err = np.linalg.norm(np.asarray(st.X) - sfmd.points, axis=1)
    assert np.median(err) < 1e-3


def test_distributed_ba_matches_single(ba_problem):
    """8-device sharded BA == single-device BA (same math, psum'd)."""
    sfmd, state, packed = ba_problem
    m = mesh_mod.make_mesh(8)
    N = packed.n_points
    Np = mesh_mod.pad_to_multiple(np.asarray(packed.cam_idx), 8,
                                  fill=-1)
    pads = Np.shape[0] - N
    xy_p = mesh_mod.pad_to_multiple(np.asarray(packed.xy), 8)
    mask_p = mesh_mod.pad_to_multiple(np.asarray(packed.mask), 8)
    X_p = mesh_mod.pad_to_multiple(np.asarray(state.X), 8)
    state_p = ba_ops.BAState(K=state.K, R=state.R, t=state.t,
                             X=jnp.asarray(X_p))

    st_d, mse_d = sharded.distributed_ba_step(
        m, state_p, jnp.asarray(Np), jnp.asarray(xy_p),
        jnp.asarray(mask_p), damping=1e-4)

    st_s, mse_s = ba_ops.ba_step_single(
        state_p, jnp.asarray(Np), jnp.asarray(xy_p), jnp.asarray(mask_p),
        damping=1e-4)
    np.testing.assert_allclose(np.asarray(st_d.R), np.asarray(st_s.R),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_d.X)[:N],
                               np.asarray(st_s.X)[:N], atol=1e-4)
    assert abs(float(mse_d) - float(ba_ops.ba_mse(state_p, jnp.asarray(Np),
               jnp.asarray(xy_p), jnp.asarray(mask_p)))) < 1e-3


def test_distributed_ba_multi_step(ba_problem):
    sfmd, state, packed = ba_problem
    m = mesh_mod.make_mesh(8)
    Np = mesh_mod.pad_to_multiple(np.asarray(packed.cam_idx), 8, fill=-1)
    xy_p = mesh_mod.pad_to_multiple(np.asarray(packed.xy), 8)
    mask_p = mesh_mod.pad_to_multiple(np.asarray(packed.mask), 8)
    X_p = mesh_mod.pad_to_multiple(np.asarray(state.X), 8)
    state_p = ba_ops.BAState(K=state.K, R=state.R, t=state.t,
                             X=jnp.asarray(X_p))
    st, mses = sharded.distributed_ba(m, state_p, jnp.asarray(Np),
                                      jnp.asarray(xy_p),
                                      jnp.asarray(mask_p), n_steps=6)
    mses = np.asarray(mses)
    assert mses[-1] < mses[0] * 1e-2


def test_sharded_gauss_newton(ba_problem):
    sfmd, state, packed = ba_problem
    m = mesh_mod.make_mesh(8)
    P = sfmd.P.astype(np.float32)
    P_obs = P[np.clip(packed.cam_idx, 0, None)]
    args = [P_obs, packed.xy, packed.mask,
            np.asarray(state.X, np.float32)]
    args = [mesh_mod.pad_to_multiple(np.asarray(a), 8) for a in args]
    X, mse, ok = sharded.sharded_gauss_newton(
        m, *[jnp.asarray(a) for a in args])
    N = packed.n_points
    err = np.linalg.norm(np.asarray(X)[:N] - sfmd.points, axis=1)
    assert np.median(err) < 1e-3
