"""PLG extraction tests (SURVEY.md §7 step 3)."""

import numpy as np
import pytest

from edgegraph3d_tpu.config import EdgeGraphConfig
from edgegraph3d_tpu.core import synthetic
from edgegraph3d_tpu.plgs import extraction
from edgegraph3d_tpu.plgs.polyline_graph import from_polyline_list

CFG = EdgeGraphConfig()


def draw(h, w, polylines):
    img = np.zeros((h, w), dtype=np.uint8)
    for pl in polylines:
        synthetic.draw_polyline(img, np.asarray(pl, dtype=np.float64))
    return img


def chain_set(plg):
    return [plg.polyline(p) for p in np.flatnonzero(plg.valid)]


def endpoint_dist(chain, a, b):
    """Distance of the chain's endpoints to the expected endpoints."""
    d1 = np.linalg.norm(chain[0] - a) + np.linalg.norm(chain[-1] - b)
    d2 = np.linalg.norm(chain[0] - b) + np.linalg.norm(chain[-1] - a)
    return min(d1, d2)


def test_single_straight_line():
    img = draw(64, 64, [[(5, 32), (58, 32)]])
    plg = extraction.extract_plg(img)
    chains = chain_set(plg)
    assert len(chains) == 1
    # simplification collapses a straight run to 2 coords
    assert len(chains[0]) == 2
    assert endpoint_dist(chains[0], np.array([5.5, 32.5]),
                         np.array([58.5, 32.5])) < 1.5


def test_diagonal_line_no_triangles():
    img = draw(64, 64, [[(5, 5), (58, 58)]])
    plg = extraction.extract_plg(img)
    chains = chain_set(plg)
    assert len(chains) == 1
    assert endpoint_dist(chains[0], np.array([5.5, 5.5]),
                         np.array([58.5, 58.5])) < 2.5


def test_L_shape_is_single_chain():
    img = draw(64, 64, [[(10, 10), (10, 50)], [(10, 50), (50, 50)]])
    plg = extraction.extract_plg(img)
    chains = chain_set(plg)
    # merged across the corner into one chain (deg-2 merge)
    assert len(chains) == 1
    assert endpoint_dist(chains[0], np.array([10.5, 10.5]),
                         np.array([50.5, 50.5])) < 2.5


def test_cross_shape_gives_four_chains_at_hub():
    img = draw(64, 64, [[(32, 5), (32, 58)], [(5, 32), (58, 32)]])
    plg = extraction.extract_plg(img, optimize=False)
    chains = chain_set(plg)
    # a 4-way hub splits into 4 chains (possibly plus tiny artifacts)
    big = [c for c in chains if len(c) > 3]
    assert len(big) == 4


def test_circle_loop_split():
    t = np.linspace(0, 2 * np.pi, 200)
    pts = np.stack([32 + 20 * np.cos(t), 32 + 20 * np.sin(t)], axis=1)
    img = draw(64, 64, [pts])
    plg = extraction.extract_plg(img)
    chains = chain_set(plg)
    # a loop is split (split_loops) -> >= 2 chains covering the circle
    assert len(chains) >= 2
    total = sum(np.sum(np.linalg.norm(np.diff(c, axis=0), axis=1))
                for c in chains)
    assert abs(total - 2 * np.pi * 20) / (2 * np.pi * 20) < 0.15


def test_simplify_polyline_tolerance():
    t = np.linspace(0, 1, 50)
    pts = np.stack([t * 100, np.sin(t * np.pi) * 10], axis=1)
    simp = extraction.simplify_polyline(pts, 1.0)
    assert 2 < len(simp) < len(pts)
    # every original point within ~tolerance of the simplified chain
    for p in pts:
        d = min(_point_seg_dist(p, simp[i], simp[i + 1])
                for i in range(len(simp) - 1))
        assert d < 1.0 + 1e-6


def _point_seg_dist(p, a, b):
    ab = b - a
    L2 = ab @ ab
    if L2 < 1e-12:
        return np.linalg.norm(p - a)
    tt = np.clip((p - a) @ ab / L2, 0, 1)
    return np.linalg.norm(p - (a + tt * ab))


def test_corner_cleanup_preserves_connectivity():
    img = draw(64, 64, [[(10, 10), (10, 50)], [(10, 50), (50, 50)]])
    mask = img > 0
    cleaned = extraction.remove_useless_corners(mask)
    assert cleaned.sum() <= mask.sum()
    node_xy, edges = extraction.build_pixel_edges(cleaned)
    chains = extraction.trace_chains(node_xy, edges)
    # still one connected path covering the L
    comp = extraction._components_of_chains(chains)
    assert len(np.unique(comp)) == 1


def test_connect_close_extremes_bridges_gap():
    chains = [np.array([[5.0, 10.0], [20.0, 10.0]], dtype=np.float32),
              np.array([[24.0, 10.0], [40.0, 10.0]], dtype=np.float32)]
    out = extraction.connect_close_extremes(chains, max_dist=6.0)
    assert len(out) == 3  # bridge added
    out2 = extraction.connect_close_extremes(
        [chains[0], chains[1] + 100.0], max_dist=6.0)
    assert len(out2) == 2  # too far


def test_smooth_length_component_filter():
    # one long smooth line + one tiny blob: blob's component filtered out
    chains = [np.stack([np.linspace(0, 200, 50),
                        np.full(50, 10.0)], axis=1).astype(np.float32),
              np.array([[300.0, 300.0], [301.0, 300.5], [301.5, 301.5]],
                       dtype=np.float32)]
    plg = from_polyline_list(chains)
    filtered = plg.filter_components_by_smooth_length(0.82)
    assert filtered.valid.sum() == 1
    assert filtered.polyline(int(np.flatnonzero(filtered.valid)[0]))[0, 0] < 250


def test_synthetic_scene_extraction_matches_projection(small_scene):
    """Extracted polylines lie on the projected curves (within ~1px)."""
    sfmd, edge_imgs, curves = small_scene
    plg = extraction.extract_plg(edge_imgs[0])
    chains = chain_set(plg)
    assert len(chains) >= 2
    # sample extracted points; verify they're near some projected curve point
    proj_pts = []
    for c in curves:
        xy, front = synthetic.project_points(sfmd, c)
        inb = synthetic.in_image(sfmd, xy)
        ok = front[0] & inb[0]
        proj_pts.append(xy[0][ok])
    proj = np.concatenate(proj_pts, axis=0)
    samples = np.concatenate([c for c in chains], axis=0)
    d = np.sqrt(((samples[:, None] - proj[None]) ** 2).sum(-1)).min(axis=1)
    assert np.median(d) < 1.2
    assert np.quantile(d, 0.95) < 2.5


def test_native_extraction_parity(small_scene):
    """C++ fast path produces equivalent chains to the numpy reference
    implementation (same recall, similar counts and arc length)."""
    from edgegraph3d_tpu.native import get_extraction_lib
    if get_extraction_lib() is None:
        pytest.skip("native extraction unavailable (no g++)")
    _, edge_imgs, _ = small_scene
    img = edge_imgs[0]
    n = extraction.extract_plg(img, CFG, use_native=True)
    p = extraction.extract_plg(img, CFG, use_native=False)
    ln = n.total_lengths().sum()
    lp = p.total_lengths().sum()
    assert abs(ln - lp) / max(lp, 1) < 0.1
    assert abs(n.n_polylines - p.n_polylines) <= max(3, 0.15 * p.n_polylines)
    # compare the CURVES, not the simplification vertices (cleanup order
    # differs between impls, shifting vertices a few px along the chain
    # while the traced curve stays the same): dense-sample both and
    # measure curve-to-curve distance
    def dense(plg):
        pts = []
        for i in np.flatnonzero(plg.valid):
            c = plg.polyline(i)
            for k in range(len(c) - 1):
                m = int(np.linalg.norm(c[k + 1] - c[k])) + 2
                t = np.linspace(0, 1, m)[:, None]
                pts.append(c[k] * (1 - t) + c[k + 1] * t)
        return np.concatenate(pts)
    dn = dense(n)
    dp = dense(p)
    d = np.sqrt(((dn[:, None] - dp[None]) ** 2).sum(-1)).min(1)
    assert np.quantile(d, 0.9) < 1.5
    assert np.median(d) < 0.5


def test_real_dtu_edge_image():
    """Extraction on a real dtu006 edge map stays sane."""
    import os
    path = "/root/reference/example/dtu006/edges/0000.png"
    if not os.path.exists(path):
        pytest.skip("dtu006 edges not available")
    from edgegraph3d_tpu.io.images import load_edge_image
    img = load_edge_image(path)
    cfg = CFG.replace(max_polylines_per_view=4096)
    plg = extraction.extract_plg(img, cfg)
    n = plg.n_polylines
    assert n > 50
    total_len = plg.total_lengths().sum()
    # at least half the edge pixels are covered by polyline arc length
    assert total_len > 0.3 * (img > 0).sum()


def test_nocycles_suppresses_small_cycles_keeps_large():
    """Bounded-BFS cycle suppression (LOOP_CHECK_DIST 8): a tiny pixel
    ring collapses to a tree; a large ring keeps its closing edge
    (parity: convertEdgeImagePixelToGraph_NoCycles,
    convert_edge_images_pixel_to_segment.cpp:347-426)."""
    # small 3x3 ring (8 pixels, closing path < 8 hops) -> no cycle
    img = np.zeros((12, 12), np.uint8)
    ring = [(4, 4), (4, 5), (4, 6), (5, 6), (6, 6), (6, 5), (6, 4), (5, 4)]
    for i, j in ring:
        img[i, j] = 255
    xy, edges = extraction.build_pixel_edges(img > 0, loop_check_dist=8)
    assert len(edges) == len(xy) - 1       # spanning tree, no cycle

    # large ring (perimeter >> 8 hops): the closing edge survives
    img2 = np.zeros((40, 40), np.uint8)
    for k in range(30):
        img2[5, 5 + k] = img2[34, 5 + k] = 255
    for k in range(30):
        img2[5 + k, 5] = img2[5 + k, 34] = 255
    xy2, edges2 = extraction.build_pixel_edges(img2 > 0, loop_check_dist=8)
    assert len(edges2) == len(xy2)         # exactly one cycle


def test_corner_clear_is_sequential_row_major():
    """The clearing scan mutates in place: later pixels see earlier
    clears (reference :294-343 semantics)."""
    img = np.zeros((8, 8), np.uint8)
    # staircase whose corners clear one by one in row-major order
    for i, j in [(2, 2), (2, 3), (3, 3), (3, 4), (4, 4), (4, 5)]:
        img[i, j] = 255
    m = extraction.remove_useless_corners(img > 0)
    # connectivity preserved: one chain from (2,2) to (4,5)
    xy, edges = extraction.build_pixel_edges(m)
    chains = extraction.trace_chains(xy, edges)
    assert len(chains) == 1


def test_connect_extremes_following_direction():
    """Aligned gap bridged; perpendicular gap not (cos 0.707 / 15 px).
    Library-surface pass (unwired, as in the reference:
    hmap_impl.cpp:323-350 is never called by optimize())."""
    a = np.asarray([[10.0, 50.0], [30.0, 50.0]], np.float32)
    b = np.asarray([[40.0, 50.0], [60.0, 50.0]], np.float32)   # aligned
    c = np.asarray([[80.0, 10.0], [80.0, 30.0]], np.float32)
    d = np.asarray([[90.0, 34.0], [110.0, 34.0]], np.float32)  # perp.
    out = extraction.connect_close_extremes_following_direction(
        [a, b, c, d], max_dist=15.0, min_cos=0.707)
    assert len(out) == 5      # exactly one bridge (a-b)
    bridge = out[-1]
    assert np.allclose(sorted(bridge[:, 0]), [30, 40])


def test_prolong_extremes_and_intersect():
    """An extreme whose prolongation crosses another polyline within
    max_dist splits it and connects (hmap_impl.cpp:282-321)."""
    a = np.asarray([[10.0, 50.0], [40.0, 50.0]], np.float32)
    wall = np.asarray([[50.0, 20.0], [50.0, 80.0]], np.float32)
    out = extraction.prolong_extremes_and_intersect([a, wall], 15.0)
    # wall split in two + bridge segment added
    assert len(out) == 4
    bridge = out[-1]
    assert np.allclose(bridge[0], [40, 50]) and np.allclose(
        bridge[1], [50, 50], atol=1e-3)


def test_numpy_native_exact_same_algorithm_dtu_crop():
    """Both implementations now run the EXACT reference algorithm
    (sequential corner clear + bounded-BFS NoCycles); their traced
    curves must coincide on real data."""
    import os
    from edgegraph3d_tpu.native import get_extraction_lib
    path = "/root/reference/example/dtu006/edges/0000.png"
    if not os.path.exists(path):
        pytest.skip("dtu006 edges not available")
    if get_extraction_lib() is None:
        pytest.skip("native extraction unavailable")
    from edgegraph3d_tpu.io.images import load_edge_image
    img = load_edge_image(path)[400:800, 600:1000]
    n = extraction.extract_plg(img, CFG, use_native=True)
    p = extraction.extract_plg(img, CFG, use_native=False)
    # stages 1-3 are algorithm-identical; stage-4 merge/bridge ordering
    # legitimately differs, so compare totals loosely and CURVES tightly
    ln = n.total_lengths().sum()
    lp = p.total_lengths().sum()
    assert abs(ln - lp) / max(lp, 1) < 0.05
    assert abs(n.n_polylines - p.n_polylines) <= max(
        2, 0.15 * p.n_polylines)

    def dense(plg):
        pts = []
        for i in np.flatnonzero(plg.valid):
            c = plg.polyline(i)
            for k in range(len(c) - 1):
                m = int(np.linalg.norm(c[k + 1] - c[k])) + 2
                t = np.linspace(0, 1, m)[:, None]
                pts.append(c[k] * (1 - t) + c[k + 1] * t)
        return np.concatenate(pts)
    dn = dense(n)
    dp = dense(p)
    d = np.sqrt(((dn[:, None] - dp[None]) ** 2).sum(-1)).min(1)
    assert np.median(d) < 0.25
    assert np.quantile(d, 0.9) < 1.0
