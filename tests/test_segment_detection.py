"""Segment-soup edge managers (legacy family) — unit tests.

Covers edgegraph3d_tpu/matching/segment_detection.py against small
hand-computable scenes (parity targets:
src/edgegraph3d/edge_managers/segment_edge_manager.cpp and the
DetectNonIntersections variant's circle intersections).
"""

import jax.numpy as jnp
import numpy as np

from edgegraph3d_tpu.matching import segment_detection as sd
from edgegraph3d_tpu.plgs.polyline_graph import from_polyline_list, stack_plgs


def _soup_one_view(segs):
    soup = sd.soup_from_segment_lists([np.asarray(segs, np.float32)])
    return jnp.asarray(soup.seg[0]), jnp.asarray(soup.valid[0])


def test_soup_from_segment_lists_padding():
    soup = sd.soup_from_segment_lists(
        [np.zeros((3, 4)), np.ones((5, 4))])
    assert soup.seg.shape == (2, 5, 4)
    assert soup.valid.sum() == 8


def test_soup_from_plg_stack_counts():
    pl = [np.array([[0, 0], [1, 0], [2, 0]], np.float32),
          np.array([[5, 5], [5, 6]], np.float32)]
    plg = from_polyline_list(pl, max_polylines=4, max_len=8)
    stack = stack_plgs([plg], max_polylines=4, max_len=8)
    soup = sd.soup_from_plg_stack(stack)
    # 2 segments from the 3-coord chain + 1 from the 2-coord chain
    assert int(soup.valid.sum()) == 3


def test_nearby_segment_points_closest_projection():
    seg, valid = _soup_one_view([[0, 0, 10, 0],      # horizontal
                                 [0, 5, 10, 5],      # horizontal, farther
                                 [100, 100, 110, 100]])
    hits = sd.nearby_segment_points(seg, valid, jnp.array([4.0, 1.0]),
                                    starting_dist=8.0, M=3)
    assert bool(hits.valid[0]) and bool(hits.valid[1])
    assert not bool(hits.valid[2])
    np.testing.assert_allclose(np.asarray(hits.xy[0]), [4.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(float(hits.dist[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hits.xy[1]), [4.0, 5.0], atol=1e-5)


def test_epipolar_segment_intersections_crossing():
    # vertical line x = 3 (normalized: 1*x + 0*y - 3 = 0)
    line = jnp.array([1.0, 0.0, -3.0])
    seg, valid = _soup_one_view([[0, 0, 10, 0],       # crosses at (3,0)
                                 [5, -5, 5, 5]])      # parallel, 2px away
    hits = sd.epipolar_segment_intersections(
        seg, valid, jnp.array([3.0, 1.0]), line, radius=20.0, M=2)
    assert bool(hits.valid[0])
    np.testing.assert_allclose(np.asarray(hits.xy[0]), [3.0, 0.0], atol=1e-5)
    # the parallel segment at distance 2 exceeds close_point_dist=1
    assert not bool(hits.valid[1])


def test_epipolar_close_point_fallback():
    # segment 0.5 px away from line x=3, never crossing
    line = jnp.array([1.0, 0.0, -3.0])
    seg, valid = _soup_one_view([[3.5, -5, 3.5, 5]])
    hits = sd.epipolar_segment_intersections(
        seg, valid, jnp.array([3.0, 0.0]), line, radius=20.0, M=1)
    assert bool(hits.valid[0])     # SELECT_CLOSE_POINTS behavior (<=1 px)
    np.testing.assert_allclose(float(hits.xy[0][0]), 3.5, atol=1e-5)


def test_circle_segment_intersections():
    seg, valid = _soup_one_view([[-10, 0, 10, 0]])   # through the center
    hits = sd.circle_segment_intersections(
        seg, valid, jnp.array([0.0, 0.0]), radius=4.0, M=4)
    got = sorted(float(x[0]) for x, ok in zip(hits.xy, hits.valid) if ok)
    np.testing.assert_allclose(got, [-4.0, 4.0], atol=1e-5)


def test_circle_segment_no_hit_outside():
    seg, valid = _soup_one_view([[10, 10, 20, 10]])
    hits = sd.circle_segment_intersections(
        seg, valid, jnp.array([0.0, 0.0]), radius=4.0, M=2)
    assert not bool(hits.valid.any())
