"""SfM JSON round-trip and data-model tests (SURVEY.md §7 step 1)."""

import json

import numpy as np
import pytest

from edgegraph3d_tpu.core import sfm, synthetic


def make_doc(sfmd):
    """Build an OpenMVG-style doc by hand (views/intrinsics/extrinsics)."""
    doc = {
        "sfm_data_version": "0.3",
        "root_path": "/data/imgs",
        "views": [], "intrinsics": [], "extrinsics": [],
        "structure": [], "control_points": [],
    }
    doc["intrinsics"].append({
        "key": 0,
        "value": {"polymorphic_id": 2147483649,
                  "polymorphic_name": "pinhole",
                  "ptr_wrapper": {"id": 2147483700, "data": {
                      "width": int(sfmd.widths[0]),
                      "height": int(sfmd.heights[0]),
                      "focal_length": float(sfmd.K[0, 0, 0]),
                      "principal_point": [float(sfmd.K[0, 0, 2]),
                                          float(sfmd.K[0, 1, 2])],
                      "disto_k3": [0.0, 0.0, 0.0]}}},
    })
    for i in range(sfmd.n_cameras):
        doc["views"].append({
            "key": i,
            "value": {"polymorphic_id": 1073741824,
                      "ptr_wrapper": {"id": 2147483649 + i, "data": {
                          "local_path": "",
                          "filename": sfmd.image_paths[i],
                          "width": int(sfmd.widths[i]),
                          "height": int(sfmd.heights[i]),
                          "id_view": i, "id_intrinsic": 0,
                          "id_pose": i}}},
        })
        doc["extrinsics"].append({
            "key": i,
            "value": {"rotation": sfmd.R[i].tolist(),
                      "center": sfmd.center[i].tolist()}})
    for pid in range(sfmd.n_points):
        obs = [{"key": int(c), "value": {"id_feat": pid,
                                         "x": [float(x), float(y)]}}
               for c, (x, y) in zip(sfmd.obs_cam[pid], sfmd.obs_xy[pid])]
        doc["structure"].append(
            {"key": pid, "value": {"X": [float(v) for v in sfmd.points[pid]],
                                   "observations": obs}})
    return doc


@pytest.fixture(scope="module")
def scene():
    sfmd, _, _ = synthetic.make_scene(n_cams=6, n_refpoints_per_curve=8,
                                      width=320, height_px=240, focal=400.0)
    return sfmd


def test_parse_roundtrip(scene, tmp_path):
    doc = make_doc(scene)
    p = tmp_path / "sfm.json"
    p.write_text(json.dumps(doc))
    loaded = sfm.read_sfm_data(str(p))

    assert loaded.n_cameras == scene.n_cameras
    assert loaded.n_points == scene.n_points
    np.testing.assert_allclose(loaded.K, scene.K, rtol=1e-6)
    np.testing.assert_allclose(loaded.R, scene.R, rtol=1e-6)
    np.testing.assert_allclose(loaded.center, scene.center, atol=1e-6)
    np.testing.assert_allclose(loaded.t, scene.t, atol=1e-6)
    np.testing.assert_allclose(loaded.points, scene.points, atol=1e-6)
    for a, b in zip(loaded.obs_cam, scene.obs_cam):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(loaded.obs_xy, scene.obs_xy):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_write_preserves_verbatim_blocks(scene, tmp_path):
    doc = make_doc(scene)
    p_in = tmp_path / "in.json"
    p_in.write_text(json.dumps(doc))
    loaded = sfm.read_sfm_data(str(p_in))

    p_out = tmp_path / "out.json"
    sfm.write_sfm_data(loaded, str(p_out))
    out = json.loads(p_out.read_text())

    # views / intrinsics / root_path / version copied verbatim
    # (parity: output_sfm_data.cpp:212-220)
    assert out["sfm_data_version"] == doc["sfm_data_version"]
    assert out["root_path"] == doc["root_path"]
    assert out["views"] == doc["views"]
    assert out["intrinsics"] == doc["intrinsics"]
    # structure regenerated with id_feat 0
    assert out["structure"][0]["value"]["observations"][0]["value"]["id_feat"] == 0
    # and reload agrees
    re = sfm.sfm_data_from_doc(out)
    np.testing.assert_allclose(re.points, scene.points, atol=1e-9)


def test_projection_matrices_project_refpoints(scene):
    """P = K[R|t] reprojects each refpoint onto its observations."""
    P = scene.P
    for pid in range(scene.n_points):
        Xh = np.append(scene.points[pid], 1.0)
        for c, xy in zip(scene.obs_cam[pid], scene.obs_xy[pid]):
            proj = P[c] @ Xh
            np.testing.assert_allclose(proj[:2] / proj[2], xy, atol=1e-6)


def test_pack_observations(scene):
    packed = sfm.pack_observations(scene.obs_cam, scene.obs_xy, max_obs=8)
    assert packed.cam_idx.shape == (scene.n_points, 8)
    for pid in range(scene.n_points):
        k = min(len(scene.obs_cam[pid]), 8)
        assert packed.mask[pid].sum() == k
        np.testing.assert_array_equal(packed.cam_idx[pid, :k],
                                      scene.obs_cam[pid][:k])


def test_add_and_remove_points(scene):
    new_X = np.array([[0.1, 0.2, 0.3]])
    aug = sfm.add_edge_points(scene, new_X,
                              [np.array([0, 1, 2], dtype=np.int32)],
                              [np.zeros((3, 2))])
    assert aug.n_points == scene.n_points + 1
    inl = np.ones(aug.n_points, dtype=bool)
    inl[0] = False
    filt = sfm.remove_outliers(aug, inl)
    assert filt.n_points == aug.n_points - 1
    np.testing.assert_allclose(filt.points[-1], new_X[0])


def test_reverse_visibility_index(scene):
    vis = scene.points_visible_from_cam()
    assert len(vis) == scene.n_cameras
    total = sum(len(v) for v in vis)
    assert total == sum(len(c) for c in scene.obs_cam)
    for c, pts in enumerate(vis):
        for pid in pts:
            assert c in scene.obs_cam[pid]
