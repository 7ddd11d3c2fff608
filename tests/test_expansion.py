"""Chain-aware all-view expansion (matching/expansion.py).

Parity targets: expand_allpoints_to_other_view_using_plmap
(reference: triangulation.cpp:742-919) and the per-observation GN
re-validation em_add_new_observation_to_3Dpositions (:347-466)."""

import numpy as np
import jax.numpy as jnp
import pytest

from edgegraph3d_tpu.config import EdgeGraphConfig
from edgegraph3d_tpu.core import synthetic
from edgegraph3d_tpu.matching import expansion
from edgegraph3d_tpu.matching import refpoints as rp
from edgegraph3d_tpu.plgs.extraction import extract_plgs

CFG = EdgeGraphConfig().replace(max_polylines_per_view=256,
                                max_polyline_len=128)


def _line_scene(n_cams=6, decoy_offset_px=None, width=640, height=480):
    """One curve observed by a camera ring; optionally a decoy 2D edge
    drawn parallel to the true projection in ONE view."""
    sfmd, imgs, curves = synthetic.make_scene(
        n_cams=n_cams, curves=("helix",), n_refpoints_per_curve=10,
        width=width, height_px=height, focal=700.0, seed=3)
    curve = curves[0]
    if decoy_offset_px is not None:
        # draw a decoy edge parallel to the true projection in view 0
        xy, front = synthetic.project_points(sfmd, curve)   # [C,N,2]
        ok = synthetic.in_image(sfmd, xy)[0] & front[0]
        pts0 = xy[0][ok] + np.asarray([0.0, decoy_offset_px])
        synthetic.draw_polyline(imgs[0], pts0)
    return sfmd, imgs, curve


def _run_stage3(sfmd, imgs, cfg=CFG):
    stack = extract_plgs(imgs, cfg)
    ctx = rp.build_context(sfmd, stack, cfg)
    return rp.reconstruct_from_refpoints(sfmd, ctx,
                                         max_starting_views=1), ctx


def test_expansion_raises_observation_counts():
    """Chain expansion must attach most non-tuple views of a clean scene
    (parity: the whole point of expand-all-views)."""
    sfmd, imgs, _ = _line_scene(n_cams=6)
    pts, ctx = _run_stage3(sfmd, imgs)
    assert len(pts.X) > 10
    mean_obs = pts.obs_mask.sum(axis=1).mean()
    # 3 tuple views always present; expansion should push well past 4
    assert mean_obs > 4.0, f"mean observations {mean_obs}"


def test_expansion_observations_reproject():
    """Every accepted expansion observation must reproject within the
    matching GN gate (MSE < 9 px^2 -> per-view residual small)."""
    sfmd, imgs, _ = _line_scene(n_cams=6)
    pts, ctx = _run_stage3(sfmd, imgs)
    P = np.asarray(ctx.P_mats)
    Xh = np.concatenate([pts.X, np.ones((len(pts.X), 1))], axis=1)
    proj = np.einsum("vij,nj->nvi", P, Xh)
    proj = proj[..., :2] / proj[..., 2:3]
    err = np.linalg.norm(proj - pts.obs_xy, axis=-1)
    err = err[pts.obs_mask]
    assert np.percentile(err, 99) < 3.5, f"p99 err {np.percentile(err, 99)}"


def test_decoy_edge_rejected_by_gn_revalidation():
    """A decoy edge ~3.5 px off the true projection in one view: the
    plain nearest-point expansion attaches it; the reference's GN
    re-validation rejects it (reprojection MSE over all observations
    blows past the gate or the residual stays at the decoy offset).
    Here the decoy is far enough that the unique-polyline rule or the
    GN gate must kick it out (triangulation.cpp:347-466)."""
    sfmd, imgs, line = _line_scene(n_cams=6, decoy_offset_px=3.5)
    pts, ctx = _run_stage3(sfmd, imgs)
    if len(pts.X) == 0:
        pytest.skip("no edge points on this scene")
    # Observations in view 0 (the decoy view) must lie on the TRUE
    # projection of the 3D points, not on the decoy.  Seed tuples that
    # picked view 0 can legitimately carry the decoy (a single 3.5 px
    # outlier among 3 views passes MSE < 9, as in the reference), so the
    # budget below covers tuple-sourced attachments; the EXPANSION path
    # must not add to it (the pre-round-2 projection+grid expansion
    # attached the decoy freely — ~half of view-0 attachments were bad).
    P0 = np.asarray(ctx.P_mats)[0]
    has0 = pts.obs_mask[:, 0]
    Xh = np.concatenate([pts.X, np.ones((len(pts.X), 1))], axis=1)
    pr = Xh @ P0.T
    pr = pr[:, :2] / pr[:, 2:3]
    err0 = np.linalg.norm(pr - pts.obs_xy[:, 0], axis=1)
    bad = (err0 > 2.5) & has0
    frac_bad = bad.sum() / max(has0.sum(), 1)
    assert frac_bad < 0.25, (
        f"{bad.sum()}/{has0.sum()} view-0 observations sit off the true "
        "projection (decoy attached by expansion)")


def test_expansion_mode_ab():
    """A/B of expand_correspondence_mode (VERDICT r2 next #7): the
    epipolar-walk positions must not lose acceptance vs the closest-point
    formulation and must reproject at least as accurately."""
    sfmd, imgs, _ = _line_scene(n_cams=6)
    res = {}
    for mode in ("closest", "epipolar"):
        cfg = CFG.replace(expand_correspondence_mode=mode,
                          max_extension_rounds=0)
        pts, ctx = _run_stage3(sfmd, imgs, cfg)
        P = np.asarray(ctx.P_mats)
        Xh = np.concatenate([pts.X, np.ones((len(pts.X), 1))], axis=1)
        proj = np.einsum("vij,nj->nvi", P, Xh)
        proj = proj[..., :2] / proj[..., 2:3]
        err = np.linalg.norm(proj - pts.obs_xy, axis=-1)[pts.obs_mask]
        res[mode] = dict(obs=int(pts.obs_mask.sum()),
                         p99=float(np.percentile(err, 99)),
                         med=float(np.median(err)))
    # measured (helix, 6 cams): identical acceptance; epipolar p99
    # ~2.2 px vs closest ~1.1 px — the intersection amplifies the
    # driving view's polyline discretization by 1/sin(crossing angle).
    # Both sit far inside the MSE < 9 px^2 acceptance gate; "closest"
    # is the default for accuracy (config.expand_correspondence_mode).
    assert res["epipolar"]["obs"] >= 0.9 * res["closest"]["obs"], res
    assert res["epipolar"]["p99"] <= 3.0, res
    assert res["closest"]["p99"] <= res["epipolar"]["p99"] + 0.25, res


def _half_hidden_scene(n_cams=6, width=640, height=480):
    """One long 3D curve fully visible in views 3..5 but ERASED past its
    midpoint in views 0..2 — the reference's chain-extension case: a
    walk driven by a low-id tuple stops at the erased views' polyline
    end, and only following with the EXPANDED view set (3..5) can
    reconstruct the far half (plg_matching.cpp:1393-1412)."""
    sfmd = synthetic.ring_cameras(n_cams, width=width, height_px=height,
                                  focal=700.0)
    t = np.linspace(-0.85, 0.85, 400)
    # slope in y and z so the projected curve crosses the ring
    # cameras' epipolar lines at healthy angles (a flat horizontal
    # curve is quasi-parallel to them and kills every walk early)
    curve = np.stack([t, 0.25 * np.sin(2.0 * t + 0.5), 0.15 + 0.3 * t],
                     axis=1)
    ref = curve[t < -0.05][::15]
    xy, front = synthetic.project_points(sfmd, ref)
    inb = synthetic.in_image(sfmd, xy, margin=1.0)
    vis = front & inb
    obs_cam, obs_xy, keep = [], [], []
    for p in range(len(ref)):
        cams = np.flatnonzero(vis[:, p])
        if len(cams) >= 3:
            obs_cam.append(cams.astype(np.int32))
            obs_xy.append(xy[cams, p])
            keep.append(p)
    sfmd.points = ref[keep]
    sfmd.obs_cam = obs_cam
    sfmd.obs_xy = obs_xy
    imgs = synthetic.render_edge_images(sfmd, [curve])
    hidden = curve[t > 0.0]
    hxy, hfront = synthetic.project_points(sfmd, hidden)
    for c in range(3):
        ij = np.round(hxy[c][hfront[c]]).astype(np.int64)
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                x = np.clip(ij[:, 0] + dx, 0, width - 1)
                y = np.clip(ij[:, 1] + dy, 0, height - 1)
                imgs[c, y, x] = 0
    return sfmd, imgs, curve, t


def test_chain_extension_reconstructs_hidden_half():
    """Without extension the far half (visible only in views 3..5) is
    unreachable whenever the seed tuple contains an erased view; with
    extension rounds the chain grows past the erased views' polyline
    end using the expanded observation set."""
    sfmd, imgs, curve, t = _half_hidden_scene()

    def far_coverage(pts):
        far = curve[t > 0.25]
        if len(pts.X) == 0:
            return 0.0
        d = np.linalg.norm(far[:, None] - pts.X[None], axis=-1).min(axis=1)
        spacing = np.median(np.linalg.norm(np.diff(far, axis=0), axis=1))
        return float((d < 4 * spacing).mean())

    cfg0 = CFG.replace(max_extension_rounds=0)
    pts0, _ = _run_stage3(sfmd, imgs, cfg0)
    cfg1 = CFG.replace(max_extension_rounds=3)
    pts1, _ = _run_stage3(sfmd, imgs, cfg1)

    # without extension the chain stops at the erase boundary (x ~ 0);
    # with it, the walk reaches deep into the hidden half (measured:
    # xmax -0.086 -> 0.79, far-coverage 0 -> ~0.3 at 10 px emit spacing)
    assert pts0.X[:, 0].max() < 0.1, "erase boundary not respected"
    assert pts1.X[:, 0].max() > 0.5, (
        f"extension did not grow the chain: xmax {pts1.X[:, 0].max()}")
    c0, c1 = far_coverage(pts0), far_coverage(pts1)
    assert c1 > c0 + 0.15, f"far coverage {c0} -> {c1}"
    # grafted points continue their parent chains (orders stay unique)
    for s in np.unique(pts1.seed_id):
        rows = pts1.chain_order[pts1.seed_id == s]
        assert len(np.unique(rows)) == len(rows)


def test_monotone_runs():
    """_monotone_runs finds same-polyline monotone stretches."""
    pl = jnp.asarray([[1, 1, 1, 2, 2, 5, 2, 2]], jnp.int32)
    pos = jnp.asarray([[0., 1., 2., 5., 6., 0., 8., 9.]])
    ok = jnp.ones((1, 8), bool)
    cv = jnp.ones((1, 8), bool)
    run_len, touches = expansion._monotone_runs(pl, pos, ok, cv)
    rl = np.asarray(run_len)[0]
    assert list(rl) == [3, 3, 3, 2, 2, 1, 2, 2]
    tt = np.asarray(touches)[0]
    assert tt[0] and tt[-1] and not tt[3]


def test_monotone_run_breaks_on_direction_flip():
    pl = jnp.asarray([[3, 3, 3, 3]], jnp.int32)
    pos = jnp.asarray([[0., 1., 0.5, 0.2]])  # flips after index 1
    ok = jnp.ones((1, 4), bool)
    cv = jnp.ones((1, 4), bool)
    run_len, _ = expansion._monotone_runs(pl, pos, ok, cv)
    rl = np.asarray(run_len)[0]
    assert rl[0] == 2 and rl[1] == 2 and rl[2] == 2 and rl[3] == 2


def test_group_chains_splits_and_orders():
    seed_ids = np.asarray([7, 7, 7, 2, 2, 7, 7])
    orders = np.asarray([1, -1, 0, 0, 1, 2, 3])
    gather, valid = expansion.group_chains(seed_ids, orders, max_t=4)
    assert gather.shape[1] == 4
    # chain 2: rows 3,4 (orders 0,1); chain 7: rows 1,2,0,5,6 split 4+1
    sid = seed_ids[gather[valid.argmax(axis=0)]]
    chains = [gather[i][valid[i]] for i in range(len(gather))]
    assert sorted(len(c) for c in chains) == [1, 2, 4]
    for c in chains:
        assert len(np.unique(seed_ids[c])) == 1
        assert (np.diff(orders[c]) > 0).all()
