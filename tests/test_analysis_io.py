"""Analysis utilities, DIMACS interop, closest-only detection."""

import numpy as np
import jax.numpy as jnp
import pytest

from edgegraph3d_tpu.config import EdgeGraphConfig
from edgegraph3d_tpu.core import synthetic
from edgegraph3d_tpu.io import dimacs
from edgegraph3d_tpu.matching import detection
from edgegraph3d_tpu.matching.grid import build_grids
from edgegraph3d_tpu.plgs.extraction import extract_plgs
from edgegraph3d_tpu.utils import analysis

CFG = EdgeGraphConfig().replace(max_polylines_per_view=256,
                                max_polyline_len=128)


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(n_cams=4, n_refpoints_per_curve=10,
                                width=160, height_px=120, focal=200.0,
                                seed=9)


def test_find_edgerefpoints(scene):
    sfmd, edges, _ = scene
    stack = extract_plgs(edges, CFG)
    mask = analysis.find_edgerefpoints(sfmd, stack)
    # synthetic refpoints are sampled ON the curves that rendered the
    # edge images, so the vast majority must count as edge-refpoints
    assert mask.mean() > 0.8
    # far-away fake point is not an edge-refpoint
    sfmd2 = sfmd.copy()
    sfmd2.obs_xy = [np.asarray(x, dtype=np.float64) + 40.0
                    for x in sfmd.obs_xy]
    mask2 = analysis.find_edgerefpoints(sfmd2, stack)
    assert mask2.mean() < mask.mean()


def test_reprojection_report(scene):
    sfmd, _, _ = scene
    errs = analysis.reprojection_errors(sfmd, 0)
    assert len(errs) == len(sfmd.obs_cam[0])
    assert errs.max() < 1.0  # synthetic observations are exact projections
    rep = analysis.reprojection_report(sfmd)
    assert rep["n_points"] == sfmd.n_points
    assert rep["max_px"] < 1.0
    assert analysis.test_refpoint_projections(sfmd, 0, verbose=False) < 1.0


def test_dimacs_roundtrip(tmp_path):
    edges = np.asarray([[0, 1], [1, 2], [0, 3]])
    w = np.asarray([0.5, 2.0, 1.25])
    p = str(tmp_path / "g.dimacs")
    dimacs.write_dimacs(p, edges, w, 4)
    e2, w2, n = dimacs.read_dimacs(p)
    assert n == 4
    np.testing.assert_array_equal(e2, edges)
    np.testing.assert_allclose(w2, w)
    c = str(tmp_path / "c.txt")
    dimacs.write_clustering(c, np.asarray([0, 0, 1, 1]))
    np.testing.assert_array_equal(dimacs.read_clustering(c), [0, 0, 1, 1])


def test_exclude_parallel_epipolar():
    """A segment parallel to the epipolar line is excluded by the
    closest-only variant but found by the default."""
    coords = np.zeros((2, 8, 2), dtype=np.float32)
    # polyline 0: horizontal segment at y=10 crossing the vertical line
    coords[0, 0] = [2.0, 10.0]
    coords[0, 1] = [18.0, 10.0]
    # polyline 1: near-vertical segment along the line at x=10
    coords[1, 0] = [10.0, 2.0]
    coords[1, 1] = [10.2, 18.0]
    from edgegraph3d_tpu.plgs.polyline_graph import PLGStack
    stack = PLGStack(coords=coords[None], length=np.asarray([[2, 2]], np.int32),
                     start_node=np.asarray([[0, 2]], np.int32),
                     end_node=np.asarray([[1, 3]], np.int32))
    grids = build_grids(stack, np.asarray([32]), np.asarray([32]), 10.0, 8)
    line = jnp.asarray([1.0, 0.0, -10.0])   # x = 10 (vertical)
    pt = jnp.asarray([10.0, 10.0])
    base = detection.detect_epipolar_correspondences(
        jnp.asarray(grids[0]), pt, line, 10.0,
        jnp.asarray(20.0), 2)
    found = set(np.asarray(base.pl_id)[np.asarray(base.valid)].tolist())
    assert 0 in found and 1 in found
    strict = detection.detect_epipolar_correspondences(
        jnp.asarray(grids[0]), pt, line, 10.0,
        jnp.asarray(20.0), 2, exclude_parallel_cos=0.965)
    found2 = set(np.asarray(strict.pl_id)[np.asarray(strict.valid)].tolist())
    assert 0 in found2 and 1 not in found2
