"""Polyline walk primitive tests (parity with polyline_graph_2d.cpp walks)."""

import jax
import jax.numpy as jnp
import numpy as np

from edgegraph3d_tpu.ops import polyline_ops as po


def pad_polyline(pts, L=32):
    pts = np.asarray(pts, dtype=np.float32)
    out = np.zeros((L, 2), dtype=np.float32)
    out[: len(pts)] = pts
    return jnp.asarray(out), jnp.asarray(len(pts))


def test_closest_point_on_polyline():
    coords, n = pad_polyline([[0, 0], [10, 0], [10, 10]])
    d, plp = po.closest_point_on_polyline(coords, n, jnp.asarray([5.0, 3.0]))
    assert abs(float(d) - 3.0) < 1e-5
    assert int(plp.seg) == 0
    np.testing.assert_allclose(np.asarray(plp.xy), [5.0, 0.0], atol=1e-5)
    # beyond the end clamps to the last vertex
    d2, plp2 = po.closest_point_on_polyline(coords, n,
                                            jnp.asarray([10.0, 15.0]))
    assert abs(float(d2) - 5.0) < 1e-5
    assert int(plp2.seg) == 1


def test_advance_by_distance_forward():
    coords, n = pad_polyline([[0, 0], [10, 0], [20, 0]])
    plp = po.PLPoint(seg=jnp.int32(0), t=jnp.float32(0.0),
                     xy=jnp.asarray([0.0, 0.0]))
    res = po.advance_by_distance(coords, n, plp, jnp.int32(1), 4.0)
    assert bool(res.found)
    np.testing.assert_allclose(np.asarray(res.plp.xy), [4.0, 0.0], atol=1e-5)
    # crossing into the second segment
    res2 = po.advance_by_distance(coords, n, plp, jnp.int32(1), 15.0)
    assert bool(res2.found)
    assert int(res2.plp.seg) == 1
    np.testing.assert_allclose(np.asarray(res2.plp.xy), [15.0, 0.0], atol=1e-4)
    # beyond the extreme
    res3 = po.advance_by_distance(coords, n, plp, jnp.int32(1), 25.0)
    assert not bool(res3.found)
    assert bool(res3.reached_extreme)


def test_advance_by_distance_backward():
    coords, n = pad_polyline([[0, 0], [10, 0], [20, 0]])
    plp = po.PLPoint(seg=jnp.int32(1), t=jnp.float32(1.0),
                     xy=jnp.asarray([20.0, 0.0]))
    res = po.advance_by_distance(coords, n, plp, jnp.int32(-1), 12.0)
    assert bool(res.found)
    assert int(res.plp.seg) == 0
    np.testing.assert_allclose(np.asarray(res.plp.xy), [8.0, 0.0], atol=1e-4)


def test_advance_euclidean_radius_semantics():
    """Radius is euclidean (circle crossing), not arc length."""
    # right-angle bend: walking 5 along arc from origin lands at (3,2)...
    # euclidean radius 5 from (0,0) must land where |p| = 5
    coords, n = pad_polyline([[0, 0], [3, 0], [3, 10]])
    plp = po.PLPoint(seg=jnp.int32(0), t=jnp.float32(0.0),
                     xy=jnp.asarray([0.0, 0.0]))
    res = po.advance_by_distance(coords, n, plp, jnp.int32(1), 5.0)
    assert bool(res.found)
    xy = np.asarray(res.plp.xy)
    assert abs(np.linalg.norm(xy) - 5.0) < 1e-4
    np.testing.assert_allclose(xy, [3.0, 4.0], atol=1e-4)


def test_next_intersection_bounded():
    coords, n = pad_polyline([[0, 0], [10, 0], [20, 0]])
    plp = po.PLPoint(seg=jnp.int32(0), t=jnp.float32(0.0),
                     xy=jnp.asarray([0.0, 0.0]))
    # vertical line x = 7 -> hits at (7,0), distance 7
    line = jnp.asarray([1.0, 0.0, -7.0])
    r = po.next_intersection_bounded(coords, n, plp, jnp.int32(1), line,
                                     min_dist=5.0, max_dist=20.0)
    assert bool(r.found)
    np.testing.assert_allclose(np.asarray(r.plp.xy), [7.0, 0.0], atol=1e-5)
    # same line but bounds exclude it -> bounded violation
    r2 = po.next_intersection_bounded(coords, n, plp, jnp.int32(1), line,
                                      min_dist=8.0, max_dist=20.0)
    assert not bool(r2.found)
    assert bool(r2.bounded_violation)
    # line beyond the polyline -> reached extreme
    line_far = jnp.asarray([1.0, 0.0, -50.0])
    r3 = po.next_intersection_bounded(coords, n, plp, jnp.int32(1), line_far,
                                      min_dist=0.0, max_dist=100.0)
    assert not bool(r3.found)
    assert bool(r3.reached_extreme)


def test_next_intersection_quasiparallel():
    coords, n = pad_polyline([[0, 0], [10, 0], [20, 0]])
    plp = po.PLPoint(seg=jnp.int32(0), t=jnp.float32(0.0),
                     xy=jnp.asarray([0.0, 0.0]))
    # nearly horizontal line close to the polyline -> quasi-parallel
    line = jnp.asarray([0.01, 1.0, -1.0])
    line = line / jnp.linalg.norm(line[:2])
    r = po.next_intersection_bounded(coords, n, plp, jnp.int32(1), line,
                                     min_dist=0.0, max_dist=1000.0)
    assert bool(r.quasiparallel)
    assert not bool(r.found)


def test_next_intersection_respects_direction_and_t():
    coords, n = pad_polyline([[0, 0], [10, 0], [20, 0]])
    # start mid-polyline at (12,0); line x=5 behind in fwd direction
    plp = po.PLPoint(seg=jnp.int32(1), t=jnp.float32(0.2),
                     xy=jnp.asarray([12.0, 0.0]))
    line = jnp.asarray([1.0, 0.0, -5.0])
    r = po.next_intersection_bounded(coords, n, plp, jnp.int32(1), line,
                                     0.0, 100.0)
    assert not bool(r.found)          # ahead only
    r2 = po.next_intersection_bounded(coords, n, plp, jnp.int32(-1), line,
                                      0.0, 100.0)
    assert bool(r2.found)
    np.testing.assert_allclose(np.asarray(r2.plp.xy), [5.0, 0.0], atol=1e-5)


def test_polyline_line_intersections_multi():
    # zigzag crossing x-axis three times
    coords, n = pad_polyline([[0, 1], [2, -1], [4, 1], [6, -1]])
    line = jnp.asarray([0.0, 1.0, 0.0])   # y = 0
    xy, seg, t, valid = po.polyline_line_intersections(coords, n, line,
                                                       max_out=4)
    assert int(valid.sum()) == 3
    xs = np.sort(np.asarray(xy)[np.asarray(valid), 0])
    np.testing.assert_allclose(xs, [1.0, 3.0, 5.0], atol=1e-5)


def test_sample_interval_points():
    coords, n = pad_polyline([[0, 0], [50, 0]])
    xy, seg, t, valid = po.sample_interval_points(coords, n, 20.0,
                                                  max_samples=8)
    v = np.asarray(valid)
    pts = np.asarray(xy)[v]
    np.testing.assert_allclose(pts[:, 0], [0.0, 20.0, 40.0], atol=1e-4)
    assert v.sum() == 3


def test_vmap_over_polylines():
    """All primitives vmap cleanly over a batch of polylines."""
    polys = [[[0, 0], [10, 0], [20, 0]],
             [[0, 0], [0, 10], [0, 20]],
             [[5, 5], [15, 15]]]
    coords = []
    lens = []
    for p in polys:
        c, n = pad_polyline(p)
        coords.append(c)
        lens.append(n)
    coords = jnp.stack(coords)
    lens = jnp.stack(lens)
    pts = jnp.asarray([[5.0, 2.0], [3.0, 5.0], [10.0, 10.0]])
    d, plp = jax.vmap(po.closest_point_on_polyline)(coords, lens, pts)
    np.testing.assert_allclose(np.asarray(d), [2.0, 3.0, 0.0], atol=1e-5)
