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
