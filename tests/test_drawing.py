"""Debug-image suite tests (the -i flag equivalent,
reference: drawing_utilities.cpp via edge_matcher.cpp:89-96,138-143)."""

import os

import numpy as np

from edgegraph3d_tpu.config import EdgeGraphConfig
from edgegraph3d_tpu.core import synthetic
from edgegraph3d_tpu.plgs.extraction import extract_plgs
from edgegraph3d_tpu.utils import drawing

CFG = EdgeGraphConfig().replace(max_polylines_per_view=256,
                                max_polyline_len=128)


def _scene():
    return synthetic.make_scene(n_cams=4, n_refpoints_per_curve=8,
                                width=160, height_px=120, focal=200.0,
                                seed=5)


def test_draw_plgs_by_polyline_and_component():
    sfmd, edges, _ = _scene()
    stack = extract_plgs(edges, CFG)
    by_pl = drawing.draw_plgs(stack, 160, 120)
    by_comp = drawing.draw_plgs(stack, 160, 120, color_by="component")
    assert by_pl.shape == by_comp.shape == (4, 120, 160, 3)
    assert by_pl.any() and by_comp.any()
    # drawn pixels coincide (same geometry, different colors)
    assert ((by_pl.sum(-1) > 0) == (by_comp.sum(-1) > 0)).all()


def test_draw_match_sets_and_epipolar(tmp_path):
    sfmd, edges, _ = _scene()
    stack = extract_plgs(edges, CFG)
    groups = [np.asarray([[0, 0], [1, 0], [2, 0]]),
              np.asarray([[0, 1], [3, 1]])]
    imgs = drawing.draw_match_sets(groups, stack, 160, 120)
    assert imgs.shape == (4, 120, 160, 3)

    from edgegraph3d_tpu.matching import refpoints as refpoints_mod
    ctx = refpoints_mod.build_context(sfmd, stack, CFG)
    ep = drawing.draw_epipolar_process(sfmd, np.asarray(ctx.F_table), 0,
                                       160, 120, stack=stack)
    assert ep.shape == (4, 120, 160, 3)
    # the observation cross is drawn in white on each viewing cam
    for c, xy in zip(sfmd.obs_cam[0],
                     np.asarray(sfmd.obs_xy[0]).reshape(-1, 2)):
        x, y = int(round(xy[0])), int(round(xy[1]))
        if 0 <= x < 160 and 0 <= y < 120:
            assert (ep[int(c), y, x] == 255).all()


def test_community_coloring_and_match_epipolars():
    """The two round-4 stage-1 recall oracles: community-colored PLGs
    (gray = unmatched) and the per-match-set epipolar overlay."""
    sfmd, edges, _ = _scene()
    stack = extract_plgs(edges, CFG)
    groups = [np.asarray([[0, 0], [1, 0], [2, 0]])]
    comm = drawing.draw_plgs_by_community(stack, groups, 160, 120)
    assert comm.shape == (4, 120, 160, 3)
    # uncolored polylines render dim gray; community members colored
    grayish = (comm == 70).all(-1)
    colored = (comm.sum(-1) > 0) & ~grayish
    assert grayish.any() and colored.any()
    # view 3 is in no community: only gray there
    assert not colored[3].any()

    from edgegraph3d_tpu.matching import refpoints as refpoints_mod
    ctx = refpoints_mod.build_context(sfmd, stack, CFG)
    epi = drawing.draw_match_set_epipolars(
        np.asarray(ctx.F_table), stack, groups[0], 160, 120)
    assert epi.shape == (4, 120, 160, 3)
    # matched polylines drawn white on their own views; epipolar lines
    # from the OTHER views land on member views
    white = (epi == 255).all(-1)
    assert white[0].any() and white[1].any() and white[2].any()
    nonwhite_color = (epi.sum(-1) > 0) & ~white
    assert nonwhite_color[[0, 1, 2]].any()
    # non-member view stays empty
    assert not epi[3].any()


def test_save_debug_images_full_suite(tmp_path):
    sfmd, edges, _ = _scene()
    stack = extract_plgs(edges, CFG)
    from edgegraph3d_tpu.matching import matches as mm
    from edgegraph3d_tpu.matching import refpoints as refpoints_mod
    ctx = refpoints_mod.build_context(sfmd, stack, CFG)
    manager = mm.MatchesManager(np.asarray(ctx.plg_length))
    pts = refpoints_mod.reconstruct_from_refpoints(
        sfmd, ctx, max_starting_views=1, manager=manager)
    drawing.save_debug_images(
        sfmd, str(tmp_path), stack=stack, rgb_images=edges,
        groups_stage1=[np.asarray([[0, 0], [1, 0]])],
        groups_stage2=[np.asarray([[2, 0], [3, 0]])],
        F_table=np.asarray(ctx.F_table), epipolar_refpoints=[0],
        manager=manager, edge_points=pts,
        P_mats=np.asarray(ctx.P_mats), ctx=ctx)
    names = os.listdir(tmp_path)
    for prefix in ("plgs_imgs", "plgs_comp", "output_on_imgs",
                   "output_on_plgs", "pmsg", "pmctr", "epipolar",
                   "claimed_intervals", "chains", "detection",
                   "pmsg_comm", "pmsg_epi"):
        assert any(n.startswith(prefix) for n in names), prefix
    # the claimed-interval overlay carries actual claims (red pixels)
    from PIL import Image
    ci = [n for n in sorted(names) if n.startswith("claimed_intervals")]
    reds = 0
    for n in ci:
        img = np.asarray(Image.open(tmp_path / n))
        reds += int(((img[..., 0] > 200) & (img[..., 1] < 100)).sum())
    assert reds > 0, "no claimed arcs rendered"
