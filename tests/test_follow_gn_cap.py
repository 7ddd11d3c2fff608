"""Compacted post-walk GN: cap semantics (following.follow_seeds).

The walk records an [S, T] step grid; DLT+GN runs on the compacted
live rows only (round-5 rework).  Contract under test:
  * default cap: identical results to the exact full-width GN
  * a forced tiny cap REPORTS the overflow (gn_overflow > 0) instead
    of silently truncating
  * the redo-at-full-width path reproduces the uncapped results
"""

import numpy as np

import jax.numpy as jnp

from edgegraph3d_tpu.config import EdgeGraphConfig
from edgegraph3d_tpu.core import synthetic
from edgegraph3d_tpu.matching import following
from edgegraph3d_tpu.matching.refpoints import (build_context,
                                                compute_seeds)
from edgegraph3d_tpu.plgs.extraction import extract_plgs


def _scene_seeds():
    cfg = EdgeGraphConfig().replace(max_polylines_per_view=256,
                                    max_follow_steps=16)
    sfmd, edge_imgs, _ = synthetic.make_scene(
        n_cams=5, n_refpoints_per_curve=10, width=320, height_px=240,
        focal=400.0, seed=3)
    stack = extract_plgs(edge_imgs, cfg)
    ctx = build_context(sfmd, stack, cfg)
    seeds_np, _ = compute_seeds(sfmd, ctx)
    S = 1 << max(len(seeds_np["cams"]) - 1, 1).bit_length()
    pad = S - len(seeds_np["cams"])

    def p(a):
        return jnp.asarray(np.pad(
            a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)))
    seeds = following.SeedTuple(
        cams=p(seeds_np["cams"]), pl_id=p(seeds_np["pl_id"]),
        seg=p(seeds_np["seg"]), t=p(seeds_np["t"]),
        xy=p(seeds_np["xy"]), X=p(seeds_np["X"]),
        valid=jnp.asarray(np.arange(S) < len(seeds_np["cams"])))
    return ctx, cfg, seeds


def _run(ctx, cfg, seeds, gn_cap):
    fwd, bwd, total = following.follow_seeds_bidirectional(
        seeds, ctx.plg_coords, ctx.plg_length, ctx.P_mats, ctx.F_table,
        cfg, cfg.max_follow_steps, gn_cap=gn_cap)
    return fwd, bwd, total


def test_default_cap_matches_full_width():
    ctx, cfg, seeds = _scene_seeds()
    S = seeds.cams.shape[0]
    full = 2 * S * cfg.max_follow_steps
    fa, ba, ta = _run(ctx, cfg, seeds, None)
    fb, bb, tb = _run(ctx, cfg, seeds, full)
    assert int(np.asarray(fa.gn_overflow).max()) == 0
    assert (np.asarray(ta) == np.asarray(tb)).all()
    assert (np.asarray(fa.valid) == np.asarray(fb.valid)).all()
    va = np.asarray(fa.valid)
    np.testing.assert_allclose(np.asarray(fa.X)[va],
                               np.asarray(fb.X)[va], atol=1e-6)
    assert int(np.asarray(ta).sum()) > 0


def test_tiny_cap_reports_overflow_and_redo_recovers():
    ctx, cfg, seeds = _scene_seeds()
    S = seeds.cams.shape[0]
    full = 2 * S * cfg.max_follow_steps
    f_t, b_t, t_t = _run(ctx, cfg, seeds, 4)      # absurdly small cap
    assert int(np.asarray(f_t.gn_overflow).max()) > 0
    # truncation is visible (fewer accepted steps), not silent
    f_f, b_f, t_f = _run(ctx, cfg, seeds, full)
    assert int(np.asarray(t_t).sum()) <= int(np.asarray(t_f).sum())
    # the documented redo (gn_cap = S*T) restores the exact result
    f_r, b_r, t_r = _run(ctx, cfg, seeds, full)
    assert (np.asarray(t_r) == np.asarray(t_f)).all()


def test_pack_meta_carries_overflow_column():
    from edgegraph3d_tpu.matching.refpoints import _M_COLS, _M_GNOVF
    ctx, cfg, seeds = _scene_seeds()
    fwd, bwd, _ = _run(ctx, cfg, seeds, 4)
    buf, n, meta = following.pack_follow_outputs(
        fwd, bwd, seeds.valid, cfg.new_point_min_steps,
        8 * seeds.cams.shape[0])
    meta = np.asarray(meta)
    assert meta.shape[1] == _M_COLS
    assert meta[0, _M_GNOVF] > 0
