"""Stage-level A/B of the grappolo replacement: device label
propagation (LP), LP + host modularity merge (production default), and
sequential host Louvain (the grappolo stand-in), measured through the
FULL pipeline on cluttered synthetic scenes.

SURVEY §7 set the bar: "validate by comparing stage-level point counts
and final accuracy" (reference baseline:
external/grappolo-05-2014/driverForGraphClustering_edited.cpp:50-170).
Run:  python tools/community_ab.py   (regenerates COMMUNITIES.md)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from edgegraph3d_tpu.config import EdgeGraphConfig  # noqa: E402
from edgegraph3d_tpu.core import synthetic  # noqa: E402
from edgegraph3d_tpu.matching import communities as comm_mod  # noqa: E402
from edgegraph3d_tpu.pipeline import PipelineStats, run_pipeline  # noqa: E402

CFG = EdgeGraphConfig().replace(max_polylines_per_view=256,
                                max_polyline_len=128, max_follow_steps=64)

SCENES = [
    dict(kind="cube", n_cams=8, n_refpoints_per_edge=12, seed=7),
    dict(n_cams=6, curves=("helix", "circle", "parabola"),
         n_refpoints_per_curve=16, seed=2),
    dict(n_cams=8, curves=("helix", "circle", "parabola"),
         n_refpoints_per_curve=12, seed=3),
    dict(n_cams=8, curves=("helix", "circle", "parabola", "line"),
         n_refpoints_per_curve=12, seed=5),
    dict(n_cams=6, curves=("circle", "parabola", "line", "line"),
         n_refpoints_per_curve=16, seed=8),
]


class GraphTap:
    """Captures the similarity graph so each partitioner can be scored
    on the REAL stage-1 graph (pass-through otherwise)."""

    def __init__(self):
        self.graphs = []
        self.orig = comm_mod.communities_from_edges

    def __call__(self, edges, weights, n_nodes, *a, **kw):
        self.graphs.append((np.asarray(edges), np.asarray(weights),
                            n_nodes))
        return self.orig(edges, weights, n_nodes, *a, **kw)


def med_dist(out, sfmd, curves):
    pts = out.points[sfmd.n_points:]
    if len(pts) == 0:
        return float("inf"), 0.0
    gt = np.concatenate(curves)
    d_pt = np.full(len(pts), np.inf)
    d_gt = np.full(len(gt), np.inf)
    for lo in range(0, len(pts), 2048):
        d = np.linalg.norm(pts[lo:lo + 2048, None] - gt[None], axis=-1)
        d_pt[lo:lo + 2048] = d.min(axis=1)
        d_gt = np.minimum(d_gt, d.min(axis=0))
    spacing = np.median(np.linalg.norm(np.diff(gt[:200], axis=0), axis=1))
    return float(np.median(d_pt)), float((d_gt < 2 * spacing).mean())


def make_oracle_groups(sfmd, stack, curves, tol_px: float = 5.0):
    """ORACLE stage-1 match sets from the ground-truth curve ids: every
    (view, polyline) is assigned to the 3D curve whose projection it
    lies on (median distance of the polyline's coords to the projected
    curve samples <= tol_px); groups = one match set per curve.  This
    bounds ATTAINABLE stage-1 recall — any loss below it under a real
    partitioner is partitioner loss; loss at the oracle itself is
    seeding/following-gate loss (VERDICT r4 weak #5 decomposition)."""
    V = sfmd.n_cameras
    groups = {c: [] for c in range(len(curves))}
    proj_curves = []
    for v in range(V):
        pc = []
        for c3d in curves:
            Xh = np.concatenate([c3d, np.ones((len(c3d), 1))], axis=1)
            pr = (sfmd.P[v] @ Xh.T).T
            pc.append(pr[:, :2] / np.maximum(pr[:, 2:3], 1e-9))
        proj_curves.append(pc)
    for v in range(V):
        for p in range(stack.coords.shape[1]):
            n = int(stack.length[v, p])
            if n < 2:
                continue
            xy = stack.coords[v, p, :n]
            best, best_d = -1, np.inf
            for ci, pr in enumerate(proj_curves[v]):
                d = np.sqrt(((xy[:, None] - pr[None]) ** 2).sum(-1))
                md = float(np.median(d.min(axis=1)))
                if md < best_d:
                    best, best_d = ci, md
            if best >= 0 and best_d <= tol_px:
                groups[best].append((v, p))
    out = []
    for ci in sorted(groups):
        g = np.asarray(sorted(groups[ci]), np.int64)
        if len(g) >= 3 and len(np.unique(g[:, 0])) >= 3:
            out.append(g)
    return out


def run_one(scene_kw, method):
    from edgegraph3d_tpu.matching import polyline_stages
    from edgegraph3d_tpu.plgs.extraction import extract_plgs

    kw = dict(scene_kw)
    maker = synthetic.make_cube_scene if kw.pop("kind", None) == "cube" \
        else synthetic.make_scene
    sfmd, edge_imgs, curves = maker(
        width=320, height_px=240, focal=400.0, **kw)
    tap = GraphTap()
    comm_mod.communities_from_edges, orig = tap, \
        comm_mod.communities_from_edges
    orig_sim = polyline_stages.similarity_match_sets
    if method == "oracle":
        # ground-truth curve-id match sets in place of stage 1's
        # partitioner (same downstream sweep/gates)
        stack = extract_plgs(edge_imgs, CFG)
        oracle_groups = make_oracle_groups(sfmd, stack, curves)
        polyline_stages.similarity_match_sets = \
            lambda *_a, **_k: oracle_groups
    try:
        stats = PipelineStats()
        out = run_pipeline(sfmd, edge_imgs,
                           CFG.replace(community_method=(
                               "auto" if method == "oracle" else method)),
                           stats=stats, max_starting_views=2)
    finally:
        comm_mod.communities_from_edges = orig
        polyline_stages.similarity_match_sets = orig_sim
    med, cov = med_dist(out, sfmd, curves)
    # score the captured stage-1 graph under this method's labels
    q, n_comm = float("nan"), 0
    if tap.graphs and method not in ("union", "union3", "oracle"):
        e, w, n = tap.graphs[0]
        if method == "louvain":
            labels = comm_mod.louvain_host(e, w, n)
        else:
            E_pad = 1 << int(np.ceil(np.log2(max(len(e), 1))))
            n_pad = 1 << int(np.ceil(np.log2(max(n, 1))))
            ep = np.full((E_pad, 2), -1, np.int32)
            ep[: len(e)] = e
            wp = np.zeros(E_pad, np.float32)
            wp[: len(w)] = w
            import jax.numpy as jnp
            labels = np.asarray(comm_mod.label_propagation(
                jnp.asarray(ep), jnp.asarray(wp), n_pad, 30))[:n]
            _, labels = np.unique(labels, return_inverse=True)
            if method == "lp+merge":
                labels = comm_mod.refine_labels_by_modularity(e, w, labels)
        q = comm_mod.modularity(e, w, labels)
        n_comm = len(np.unique(labels))
    return dict(
        modularity=q, n_comm=n_comm,
        stage1_sets=stats.counts.get("stage1_similarity_graph", 0),
        stage1_pts=stats.counts.get("stage1_sweep", 0),
        total_pts=stats.counts.get("outlier_filter", 0) - sfmd.n_points,
        med_dist=med, coverage=cov)


def main():
    lines = [
        "# Community detection A/B — grappolo replacement, measured",
        "",
        "Partitioners through the FULL pipeline on cluttered",
        "synthetic scenes (3-4 curves crossing in image space; "
        "`python tools/community_ab.py` regenerates):",
        "",
        "* **lp** — device label propagation (communities.py)",
        "* **lp+merge** — LP + host modularity merge",
        "* **louvain** — host Louvain, stand-in for grappolo's "
        "multi-phase Louvain (louvainMultiPhaseRun.cpp; the "
        "batch-parallel pass above 20k nodes)",
        "* **union** — lp+merge + louvain partitions swept, overlap "
        "deduped by the interval claims (round-4 default)",
        "* **union3** — union + the RAW-LP partition as a third arm "
        "(round-5 production default, config.community_method="
        "\"auto\")",
        "* **oracle** — ground-truth curve-id match sets (upper bound "
        "on attainable stage-1 recall: loss under a real partitioner "
        "vs this row is PARTITIONER loss; loss at the oracle itself "
        "is seeding/following-gate loss)",
        "",
        "| scene | method | Q (stage-1 graph) | communities | "
        "stage-1 sets | stage-1 points | final edge-points | "
        "med dist3d | coverage |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for i, sc in enumerate(SCENES):
        # drop compiled executables between scenes: XLA:CPU LLVM OOMs
        # (cgroup memory limit) once a few dozen large programs
        # accumulate in one process — same vector tests/conftest.py
        # guards against
        jax.clear_caches()
        for method in ("lp", "lp+merge", "louvain", "union", "union3",
                       "oracle"):
            r = run_one(sc, method)
            label = (f"{len(sc['curves'])} curves"
                     if "curves" in sc else "cube")
            lines.append(
                f"| {i} ({label}, seed "
                f"{sc['seed']}) | {method} | {r['modularity']:.4f} | "
                f"{r['n_comm']} | {r['stage1_sets']} | "
                f"{r['stage1_pts']} | {r['total_pts']} | "
                f"{r['med_dist']:.4f} | {r['coverage']:.3f} |")
            print(lines[-1], file=sys.stderr)
    lines += [
        "",
        "Findings (2026-08-21 run):",
        "",
        "* On REAL similarity graphs plain LP can over-MERGE: scene 1",
        "  collapses to a single community (Q=0.00 vs Louvain 0.44),",
        "  costing stage-1 recall (0 vs 3 stage-1 points, final",
        "  coverage 0.089 vs 0.158).  The modularity merge only fixes",
        "  over-SPLITS (planted-partition microbenchmark in",
        "  tests/test_communities.py: LP+merge == Louvain on every",
        "  seed), not over-merges.",
        "* Louvain's partitions score 0.05-0.19 higher Q on the curve",
        "  scenes — but its RESOLUTION LIMIT merges cube-edge match",
        "  sets on the cube workload (16 -> 12 sets on the full-size",
        "  bench scene), and bigger merged sets kill seeds through the",
        "  downstream unique-triangulation test: bench coverage 0.92",
        "  vs LP's 1.00.",
        "* Neither partitioner dominates. The UNION of both partitions",
        "  recovers each one's misses on every scene (bench coverage",
        "  1.00 AND the collapsed scene's Louvain recall); overlapping",
        "  sweeps are deduped by the interval claims.",
        "",
        "**Production default** (`config.community_method = \"auto\"`):",
        "the union of the lp+merge and Louvain partitions for graphs",
        "<= 20k nodes (all real scenes; Louvain is ms-cheap there),",
        "LP+merge alone beyond that (the device-scalable formulation).",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COMMUNITIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
