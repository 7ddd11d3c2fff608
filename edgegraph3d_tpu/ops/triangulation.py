"""Triangulation and batched per-point Gauss-Newton refinement.

TPU-native replacement for the reference's per-point OpenCV pipeline
(reference: src/edgegraph3d/utils/geometry/triangulation.cpp):
  * init by two-view DLT on the (min-id, max-id) camera pair
    (parity: em_estimate3Dpositions, triangulation.cpp:178-323 —
    widest-baseline heuristic) or N-view DLT,
  * <=30 damped-free Gauss-Newton iterations over all observations,
    residual r = observed - projected, mse = sum r^2 / (2N),
    convergence |mse - last_mse| < 5e-7, update X += H^-1 J^T r,
    reject on near-singular Hessian (det < 1e-5) or final mse >= accept
    (parity: em_GaussNewton + em_point2D3DJacobian,
     triangulation.cpp:53-176; filter variant gauss_newton.cpp:83-134).

All functions are batched over points: observations come in fixed-shape
padded tensors [N, O, ...] with a boolean mask, and the whole solve is
one fused XLA computation of batched 3x3 solves — the reference's
`#pragma omp for` over points becomes the batch dimension.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from edgegraph3d_tpu.ops.geometry import project
from edgegraph3d_tpu.ops.linalg3 import smallest_eigvec4, solve3

# true-f32 accumulation for tiny contractions (see geometry.py)
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


# ----------------------------------------------------------------------
# DLT triangulation
# ----------------------------------------------------------------------

def triangulate_dlt(P: jnp.ndarray, xy: jnp.ndarray,
                    mask: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous N-view DLT.

    P: [..., O, 3, 4], xy: [..., O, 2], mask: [..., O] -> X [..., 3].
    Rows (x*P3 - P1), (y*P3 - P2) per view; smallest eigenvector of
    A^T A (4x4 eigh — batched, MXU/VPU friendly; replaces
    cv::triangulatePoints' SVD).
    """
    dtype = P.dtype
    r1 = xy[..., 0:1] * P[..., 2, :] - P[..., 0, :]   # [...,O,4]
    r2 = xy[..., 1:2] * P[..., 2, :] - P[..., 1, :]
    A = jnp.concatenate([r1, r2], axis=-2)            # [...,2O,4]
    m2 = jnp.concatenate([mask, mask], axis=-1).astype(dtype)[..., None]
    # row normalization improves conditioning in f32
    rn = jnp.linalg.norm(A, axis=-1, keepdims=True)
    A = A / jnp.maximum(rn, 1e-12) * m2
    AtA = _einsum("...ni,...nj->...ij", A, A)
    # nullspace via shifted power iteration (closed-form path — batched
    # eigh lowers to slow QR loops on TPU, see ops/linalg3.py)
    Xh = smallest_eigvec4(AtA)
    w = Xh[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    return Xh[..., :3] / w[..., None]


def triangulate_pair_minmax(P_obs: jnp.ndarray, xy: jnp.ndarray,
                            cam_idx: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Two-view DLT on the (min cam id, max cam id) observations.

    Mirrors em_estimate3Dpositions' widest-baseline init
    (triangulation.cpp:186-254).  P_obs: [...,O,3,4] gathered per-obs
    projection matrices, cam_idx: [...,O] int (-1 padded), mask [...,O].
    """
    big = jnp.where(mask, cam_idx, jnp.iinfo(jnp.int32).max)
    small = jnp.where(mask, cam_idx, -1)
    i_min = jnp.argmin(big, axis=-1)
    i_max = jnp.argmax(small, axis=-1)
    sel = jnp.stack([i_min, i_max], axis=-1)          # [...,2]
    take = lambda arr: jnp.take_along_axis(
        arr, sel.reshape(sel.shape + (1,) * (arr.ndim - sel.ndim))
        .astype(jnp.int32), axis=sel.ndim - 1)
    P2 = jnp.take_along_axis(P_obs, sel[..., None, None], axis=-3)
    xy2 = jnp.take_along_axis(xy, sel[..., None], axis=-2)
    del take
    m2 = jnp.ones(sel.shape, dtype=bool)
    return triangulate_dlt(P2, xy2, m2)


# ----------------------------------------------------------------------
# Batched Gauss-Newton
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_iters", "epsilon", "accept_mse",
                                   "det_min"))
def gauss_newton_batched(
    P_obs: jnp.ndarray,      # [N, O, 3, 4] per-observation cameras
    xy: jnp.ndarray,         # [N, O, 2]    observed 2D points
    mask: jnp.ndarray,       # [N, O]       valid observations
    X0: jnp.ndarray,         # [N, 3]       initial 3D points
    max_iters: int = 30,
    epsilon: float = 5e-7,
    accept_mse: float = 9.0,
    det_min: float = 1e-5,
):
    """Refine all points at once; returns (X, mse, valid).

    Semantics follow em_GaussNewton exactly (triangulation.cpp:105-176):
    per-point early stop when the mse change drops below `epsilon`
    (implemented as a freeze mask — identical fixed-point, fixed cost),
    rejection on near-singular Hessians, acceptance on final
    mse < accept_mse.  `mse` is sum of squared pixel residuals / (2 *
    n_obs).
    """
    dtype = X0.dtype
    n_obs = jnp.maximum(jnp.sum(mask, axis=-1), 1).astype(dtype)   # [N]
    mf = mask.astype(dtype)

    def residuals_mse(X):
        pr = project(P_obs, X[:, None, :])            # [N,O,2]
        r = (xy - pr) * mf[..., None]
        mse = jnp.sum(r * r, axis=(-2, -1)) / (2.0 * n_obs)
        return r, mse

    def jacobian(X):
        """J rows d(proj)/dX per obs: [N,O,2,3]."""
        Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
        proj = _einsum("noij,nj->noi", P_obs, Xh)   # [N,O,3]
        xH, yH, zH = proj[..., 0], proj[..., 1], proj[..., 2]
        zH = jnp.where(jnp.abs(zH) < 1e-12,
                       jnp.where(zH < 0, -1e-12, 1e-12), zH)
        p0 = P_obs[..., 0, :3]                         # [N,O,3]
        p1 = P_obs[..., 1, :3]
        p2 = P_obs[..., 2, :3]
        z2 = (zH * zH)[..., None]
        Jx = (p0 * zH[..., None] - p2 * xH[..., None]) / z2
        Jy = (p1 * zH[..., None] - p2 * yH[..., None]) / z2
        return jnp.stack([Jx, Jy], axis=-2)            # [N,O,2,3]

    def cond(carry):
        # EARLY EXIT: stop when every point is frozen (converged) or
        # singular — the freeze mask makes further iterations no-ops, so
        # skipping them is exact, and typical batches converge in well
        # under max_iters sequential steps.
        i, X, last_mse, frozen, singular = carry
        return (i < max_iters) & ~jnp.all(frozen | singular)

    def body(carry):
        i, X, last_mse, frozen, singular = carry
        r, mse = residuals_mse(X)
        conv = jnp.abs(mse - last_mse) < epsilon
        now_frozen = frozen | conv
        J = jacobian(X) * mf[..., None, None]
        H = _einsum("noki,nokj->nij", J, J)         # [N,3,3]
        g = _einsum("noki,nok->ni", J, r)           # [N,3]
        dX, detH = solve3(H, g)                     # closed-form Cramer
        # absolute test mirrors the reference (det < 1e-5,
        # triangulation.cpp:97-99); the scale-relative test catches
        # rank-deficient H whose f32 det noise exceeds the absolute
        # threshold (e.g. all observations from one camera).
        h_scale = jnp.linalg.norm(H, axis=(-2, -1)) / jnp.sqrt(3.0)
        bad = (jnp.abs(detH) < det_min) | (
            jnp.abs(detH) < 1e-5 * h_scale ** 3)
        dX = jnp.where(bad[:, None], 0.0, dX)
        step_ok = ~(now_frozen | bad)
        X_new = jnp.where(step_ok[:, None], X + dX, X)
        last_new = jnp.where(now_frozen, last_mse, mse)
        singular = singular | (bad & ~now_frozen)
        return i + 1, X_new, last_new, now_frozen, singular

    zero = jnp.zeros(X0.shape[0], dtype=dtype)
    frozen0 = jnp.zeros(X0.shape[0], dtype=bool)
    _, X, last_mse, _, singular = jax.lax.while_loop(
        cond, body, (jnp.int32(0), X0, zero, frozen0, frozen0))
    valid = (~singular) & (last_mse < accept_mse) & (jnp.sum(mask, axis=-1) >= 2)
    return X, last_mse, valid


def estimate_3d_positions(
    P_obs: jnp.ndarray, xy: jnp.ndarray, cam_idx: jnp.ndarray,
    mask: jnp.ndarray, max_iters: int = 30, epsilon: float = 5e-7,
    accept_mse: float = 9.0,
):
    """Full em_estimate3Dpositions parity (triangulation.cpp:178-323):
    widest-pair DLT init, then batched GN over all observations."""
    X0 = triangulate_pair_minmax(P_obs, xy, cam_idx, mask)
    return gauss_newton_batched(P_obs, xy, mask, X0,
                                max_iters=max_iters, epsilon=epsilon,
                                accept_mse=accept_mse)


def reprojection_mse(P_obs, xy, mask, X):
    """Mean squared pixel reprojection error per point, sum r^2/(2N)."""
    mf = mask.astype(X.dtype)
    pr = project(P_obs, X[..., None, :])
    r = (xy - pr) * mf[..., None]
    n = jnp.maximum(jnp.sum(mask, axis=-1), 1).astype(X.dtype)
    return jnp.sum(r * r, axis=(-2, -1)) / (2.0 * n)


def add_observation_to_3d_points(
    P_obs: jnp.ndarray, xy: jnp.ndarray, mask: jnp.ndarray,
    X: jnp.ndarray, new_P: jnp.ndarray, new_xy: jnp.ndarray,
    new_valid: jnp.ndarray | None = None, max_iters: int = 30,
    epsilon: float = 5e-7, accept_mse: float = 9.0,
):
    """Add one observation per point to existing 3D estimates and
    re-refine (parity: em_add_new_observation_to_3Dpositions,
    triangulation.cpp:347-466 — warm-started from the current X rather
    than re-triangulated, then full GN over old + new observations).

    P_obs [N,O,3,4], xy [N,O,2], mask [N,O] — existing observations;
    X [N,3] current estimates; new_P [N,3,4], new_xy [N,2] the added
    observation (new_valid masks points that get no new observation).
    Returns (X', mse, valid, mask') where mask' includes the new
    observation in the first padded slot.
    """
    if new_valid is None:
        new_valid = jnp.ones(X.shape[0], dtype=bool)
    # place the new observation in each point's first free slot
    free = ~mask                                           # [N,O]
    first_free = jnp.argmax(free, axis=-1)                 # [N]
    has_free = jnp.any(free, axis=-1)
    put = new_valid & has_free
    rows = jnp.arange(X.shape[0])
    P2 = P_obs.at[rows, first_free].set(
        jnp.where(put[:, None, None], new_P, P_obs[rows, first_free]))
    xy2 = xy.at[rows, first_free].set(
        jnp.where(put[:, None], new_xy, xy[rows, first_free]))
    mask2 = mask.at[rows, first_free].set(mask[rows, first_free] | put)
    Xr, mse, valid = gauss_newton_batched(
        P2, xy2, mask2, X, max_iters=max_iters, epsilon=epsilon,
        accept_mse=accept_mse)
    return Xr, mse, valid, mask2


def triangulate_view_combinations(
    P_obs: jnp.ndarray, xy: jnp.ndarray, mask: jnp.ndarray,
    min_views: int = 3, max_iters: int = 30, epsilon: float = 5e-7,
    accept_mse: float = 9.0, max_subset_views: int = 12,
):
    """Best-subset triangulation + greedy re-expansion (parity:
    compute_3d_point_coords_combinations, triangulation.cpp:1105-1158).

    Intentional deviation from the reference's enumeration order: the
    reference enumerates subsets of exactly `min_views` size via
    prev_permutation and greedily expands the FIRST accepted one
    (triangulation.cpp:1105-1158); here every subset size is solved at
    once and the winner is chosen lexicographically by (max size, then
    min mse) before the same greedy re-add. On ambiguous inputs the two
    can pick different (point, used-set) pairs; batching all subsets is
    the TPU-shaped formulation and the larger-first criterion dominates
    the reference's minimal-subset pick in observation count.

    TPU-native: all 2^O subset masks are a static tensor; every subset
    is solved in ONE batched GN (subsets = the batch dimension) and the
    greedy re-add is a static loop of O batched single-observation adds.
    To bound the 2^O blowup, at most `max_subset_views` observations
    (the first valid ones, mirroring the reference's view-id order)
    enter the enumeration; the rest are only considered by the greedy
    re-add phase.

    P_obs [O,3,4], xy [O,2], mask [O] (one point's candidate views).
    Returns (X [3], mse, valid, used_mask [O]).
    """
    O = int(mask.shape[0])
    if O > max_subset_views:
        # keep the first max_subset_views VALID observations for the
        # subset enumeration (stable sort: valid first, id order kept)
        order = jnp.argsort(~mask, stable=True)          # [O]
        sel = order[:max_subset_views]                   # [K]
        X, mse, valid, used_k = triangulate_view_combinations(
            P_obs[sel], xy[sel], mask[sel], min_views=min_views,
            max_iters=max_iters, epsilon=epsilon, accept_mse=accept_mse,
            max_subset_views=max_subset_views)
        used = jnp.zeros(O, dtype=bool).at[sel].set(used_k)
        # greedy re-add of the observations excluded from enumeration
        in_enum = jnp.zeros(O, dtype=bool).at[sel].set(True)
        for o in range(O):
            excluded = mask[o] & ~in_enum[o] & valid
            Xr, mse_r, ok_r, _ = add_observation_to_3d_points(
                P_obs[None], xy[None], used[None], X[None],
                P_obs[None, o], xy[None, o],
                new_valid=excluded[None], max_iters=max_iters,
                epsilon=epsilon, accept_mse=accept_mse)
            accept = excluded & ok_r[0]
            X = jnp.where(accept, Xr[0], X)
            used = used.at[o].set(used[o] | accept)
        mse = reprojection_mse(P_obs[None], xy[None], used[None],
                               X[None])[0]
        return X, mse, valid, used
    # static subset enumeration (skip subsets smaller than min_views)
    bits = np.arange(2 ** O, dtype=np.uint32)
    table = ((bits[:, None] >> np.arange(O)) & 1).astype(bool)   # [S,O]
    table = table[table.sum(axis=1) >= min_views]
    if len(table) == 0:
        z = jnp.zeros(3, P_obs.dtype)
        return z, jnp.asarray(jnp.inf, P_obs.dtype), jnp.asarray(False), \
            jnp.zeros(O, dtype=bool)
    sub = jnp.asarray(table)                                     # [S,O]
    m_sub = sub & mask[None, :]                                  # [S,O]
    enough = jnp.sum(m_sub, axis=-1) >= min_views
    S = sub.shape[0]
    P_b = jnp.broadcast_to(P_obs[None], (S,) + P_obs.shape)
    xy_b = jnp.broadcast_to(xy[None], (S,) + xy.shape)
    cam_b = jnp.broadcast_to(jnp.arange(O, dtype=jnp.int32)[None], (S, O))
    X_s, mse_s, ok_s = estimate_3d_positions(
        P_b, xy_b, cam_b, m_sub, max_iters=max_iters, epsilon=epsilon,
        accept_mse=accept_mse)
    ok_s = ok_s & enough
    size = jnp.sum(m_sub, axis=-1)
    # lexicographic (max size, then min mse) selection in two exact
    # integer/float steps — no composite float score, no tie-break
    # precision loss at large sizes
    max_size = jnp.max(jnp.where(ok_s, size, -1))
    tier = ok_s & (size == max_size)
    best = jnp.argmin(jnp.where(tier, mse_s, jnp.inf))
    any_ok = jnp.any(ok_s)
    X = X_s[best]
    used = m_sub[best] & any_ok
    # greedy re-add of excluded views, in view order (parity :1146-1158)
    for o in range(O):
        excluded = mask[o] & ~used[o] & any_ok
        Xr, mse_r, ok_r, _ = add_observation_to_3d_points(
            P_obs[None], xy[None], used[None], X[None],
            P_obs[None, o], xy[None, o],
            new_valid=excluded[None], max_iters=max_iters,
            epsilon=epsilon, accept_mse=accept_mse)
        accept = excluded & ok_r[0]
        X = jnp.where(accept, Xr[0], X)
        used = used.at[o].set(used[o] | accept)
    mse = reprojection_mse(P_obs[None], xy[None], used[None], X[None])[0]
    return X, mse, any_ok, used
