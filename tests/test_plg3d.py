"""3D polyline graph assembly / fragment / serialization tests."""

import numpy as np

from edgegraph3d_tpu.matching.refpoints import EdgePoints
from edgegraph3d_tpu.plgs import polyline_graph_3d as p3


def make_pts():
    # two chains: seed 0 with bwd(-2,-1), seed(0), fwd(1,2); seed 5 short
    X = np.asarray([
        [0, 0, 2.0], [0, 0, 1.0], [0, 0, 0.0], [0, 0, -1.0], [0, 0, -2.0],
        [5, 0, 0.0], [5, 0, 1.0],
    ])
    seed_id = np.asarray([0, 0, 0, 0, 0, 5, 5])
    order = np.asarray([-2, -1, 0, 1, 2, 0, 1])
    V = 3
    obs_mask = np.ones((7, V), bool)
    obs_xy = np.zeros((7, V, 2), np.float32)
    return EdgePoints(X=X, obs_xy=obs_xy, obs_mask=obs_mask,
                      seed_refpoint=np.zeros(7, np.int64),
                      seed_id=seed_id, chain_order=order)


def test_assemble_chains():
    plg = p3.assemble_from_edge_points(make_pts(), n_views=3)
    assert plg.n_polylines == 2
    c0 = plg.polyline(0)
    # ordered along the chain: z from 2 down to -2
    np.testing.assert_allclose(c0[:, 2], [2, 1, 0, -1, -2])
    assert plg.length[1] == 2


def test_fragment():
    plg = p3.assemble_from_edge_points(make_pts(), n_views=3)
    frag = plg.fragment(0.5)
    # every segment now <= 0.5
    for p in np.flatnonzero(frag.valid):
        d = np.linalg.norm(np.diff(frag.polyline(p), axis=0), axis=1)
        assert (d <= 0.5 + 1e-6).all()
    # total arc length preserved
    np.testing.assert_allclose(frag.total_lengths().sum(),
                               plg.total_lengths().sum(), rtol=1e-5)


def test_save_load(tmp_path):
    plg = p3.assemble_from_edge_points(make_pts(), n_views=3)
    path = str(tmp_path / "g.npz")
    plg.save(path)
    back = p3.PLG3D.load(path)
    np.testing.assert_array_equal(back.length, plg.length)
    np.testing.assert_allclose(back.coords, plg.coords)
    np.testing.assert_array_equal(back.obs_mask, plg.obs_mask)


def test_plg_stack_io(tmp_path, small_scene):
    from edgegraph3d_tpu.plgs.extraction import extract_plgs
    from edgegraph3d_tpu.plgs.plg_io import load_plg_stack, save_plg_stack
    from edgegraph3d_tpu.config import EdgeGraphConfig
    _, edge_imgs, _ = small_scene
    cfg = EdgeGraphConfig().replace(max_polylines_per_view=128,
                                    max_polyline_len=64)
    stack = extract_plgs(edge_imgs[:2], cfg)
    path = str(tmp_path / "plgs.npz")
    save_plg_stack(stack, path)
    back = load_plg_stack(path)
    np.testing.assert_allclose(back.coords, stack.coords)
    np.testing.assert_array_equal(back.length, stack.length)


def test_fragment_resamples_at_arclength():
    """Reference semantics (polyline_graph_3d.cpp:99-122): interior
    points are replaced by arc-length samples; interpolated points carry
    no observations, the retained first/last keep theirs."""
    pts = make_pts()
    pts.obs_xy[:] = 7.0
    plg = p3.assemble_from_edge_points(pts, n_views=3)
    frag = plg.fragment(0.5)
    c0 = frag.polyline(0)
    d = np.linalg.norm(np.diff(c0, axis=0), axis=1)
    np.testing.assert_allclose(d[:-1], 0.5, atol=1e-6)  # uniform steps
    assert frag.obs_mask[0, 0].all() and frag.obs_mask[0][1:-1].sum() == 0


def test_simplify_drops_collinear():
    """Collinear interior points vanish; a genuine corner survives
    (parity: simplify_polyline, polyline_graph_3d.cpp:205-250,
    MAXIMUM_LINEARIZABILITY_DISTANCE 0.01)."""
    # straight chain with tiny jitter -> should collapse to 2 points
    z = np.linspace(0, 1, 9)
    chain_straight = np.stack([np.zeros(9), np.full(9, 0.004), z], 1)
    chain_straight[:, 1] *= np.sin(z * 20)  # jitter < 0.01
    # L-shaped chain -> corner must survive
    chain_l = np.asarray([[0, 0, 0], [0, 0, 0.5], [0, 0, 1.0],
                          [0, 0.5, 1.0], [0, 1.0, 1.0]], np.float64)
    plg = p3.from_chain_list([chain_straight, chain_l], n_views=0)
    simp = plg.simplify(0.01)
    assert simp.length[0] == 2
    np.testing.assert_allclose(simp.polyline(0)[0], chain_straight[0],
                               atol=1e-6)
    np.testing.assert_allclose(simp.polyline(0)[-1], chain_straight[-1],
                               atol=1e-6)
    c1 = simp.polyline(1)
    assert len(c1) == 3  # two straight runs + the corner
    np.testing.assert_allclose(c1[1], [0, 0, 1.0], atol=1e-6)


def test_simplify_respects_tolerance():
    """A bump larger than the tolerance is kept."""
    chain = np.asarray([[0, 0, 0], [0, 0.5, 0.5], [0, 0, 1.0]], np.float64)
    plg = p3.from_chain_list([chain], n_views=0)
    assert plg.simplify(0.01).length[0] == 3      # bump kept
    assert plg.simplify(1.0).length[0] == 2       # bump within tol


def test_filter_nodes():
    """Polylines whose extremes are not inliers are removed (parity:
    filter_nodes + remove_invalid_polylines,
    polyline_graph_3d_hmap_impl.cpp:156-178)."""
    plg = p3.assemble_from_edge_points(make_pts(), n_views=3)
    ends = np.stack([plg.polyline(0)[0], plg.polyline(0)[-1],
                     plg.polyline(1)[0], plg.polyline(1)[-1]])
    kept_all = plg.filter_nodes(ends)
    assert kept_all.n_polylines == 2
    kept_one = plg.filter_nodes(ends[:2])   # only chain-0 extremes inline
    assert kept_one.n_polylines == 1
    np.testing.assert_allclose(kept_one.polyline(0), plg.polyline(0))
    assert plg.filter_nodes(np.zeros((0, 3))).n_polylines == 0


def test_remove_polylines_with_longsegments():
    """nth_element threshold on max segment lengths (parity:
    polyline_graph_3d_hmap_impl.cpp:143-156)."""
    chains = [
        np.asarray([[0, 0, 0], [0, 0, 0.1], [0, 0, 0.2]]),
        np.asarray([[1, 0, 0], [1, 0, 0.1], [1, 0, 0.2]]),
        np.asarray([[2, 0, 0], [2, 0, 0.1], [2, 0, 0.2]]),
        np.asarray([[3, 0, 0], [3, 0, 5.0]]),     # one long segment
    ]
    plg = p3.from_chain_list(chains, n_views=0)
    out = plg.remove_polylines_with_longsegments(0.75)
    assert out.n_polylines == 3
    assert out.max_segment_lengths()[out.valid].max() < 1.0
