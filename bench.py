"""Benchmark harness: dtu-scale synthetic reconstruction throughput.

Prints ONE JSON line:
    {"metric": "views_per_s", "value": N, "unit": "views/s",
     "vs_baseline": M}

Workload: a dtu006-like synthetic scene — 1600x1200 binary edge images
rendered from 3D cube+curve geometry, ring cameras with varied heights,
~600 SfM refpoints — run through the full pipeline (PLG extraction,
grids/F-matrices, stage-3 refpoint matching with chain following,
density + GN outlier filters).  dtu006's own input.json is stripped
from the reference mirror, so this synthetic workload is the standing
proxy; its image size, view count and refpoint density mirror the real
example (reference: example/dtu006 — 49 views, 1600x1200, 6268
refpoints; scaled by --views/--refpoints).

Two baselines are reported (both measured on this machine):

  * `vs_baseline`      — against the SAME code on the CPU backend
    TODAY (`--probe-cpu`).  Honest but self-referential: every
    algorithmic improvement speeds the CPU run too, so this ratio
    only measures what the accelerator adds over this host's many
    AVX-512 cores through the TPU tunnel (each device round trip
    costs ~40-100 ms here; a local chip would not pay it).
  * `vs_frozen_r1_cpu` — against the FROZEN round-1 CPU measurement
    of this workload (0.2835 views/s, 2026-08-18), the closest
    available stand-in for "the reference's CPU wall-clock" in
    BASELINE.md's >= 10x target: the reference binary is not runnable
    here (dtu input.json stripped from the mirror), and the reference
    would not gain from this engine's later optimizations.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# measured with `python bench.py --probe-cpu` on this host (see module
# docstring); update when the workload or pipeline changes materially.
# 2026-08-18: 0.2835 views/s (28.2s steady-state for 8 views @1600x1200
#   after an identical warmup pass)  <- FROZEN_R1 below
# 2026-08-20: 0.3406 views/s (23.5s) — round-2 SoA kernels
# 2026-08-21: 1.7877 views/s (4.5s) — pow2 auto-sized shapes, L=64
#   budgets, threaded extraction, adaptive chunks (same-code CPU gains
#   from every one of these)
CPU_BASELINE_VIEWS_PER_S = 1.7877
FROZEN_R1_CPU_VIEWS_PER_S = 0.2835


def build_workload(n_views: int, width: int, height: int,
                   n_ref_per_edge: int, seed: int = 0):
    from edgegraph3d_tpu.core import synthetic
    focal = 2.2 * width / 1.6
    return synthetic.make_cube_scene(
        n_cams=n_views, n_refpoints_per_edge=n_ref_per_edge,
        width=width, height_px=height, focal=focal, seed=seed)


def quality_metrics(out_sfmd, in_sfmd, curves):
    """3D accuracy + completeness of the reconstructed edge-points
    against the ground-truth synthetic curves: median distance of
    edge-points to the nearest curve sample, and `coverage` = fraction
    of curve samples with an edge-point within 2x the median sample
    spacing (`coverage_4x` is the looser 4x variant reported through
    round 2 under the name `coverage`; kept for cross-round
    comparability)."""
    import numpy as np
    pts = out_sfmd.points[in_sfmd.n_points:]
    gt = np.concatenate(curves)
    if len(pts) == 0:
        return dict(edge_points=0, med_dist3d=float("inf"),
                    coverage=0.0, coverage_4x=0.0)
    # chunked nearest-neighbour (no scipy dependency)
    d_pt = np.full(len(pts), np.inf)
    d_gt = np.full(len(gt), np.inf)
    for lo in range(0, len(pts), 2048):
        d = np.linalg.norm(pts[lo:lo + 2048, None] - gt[None], axis=-1)
        d_pt[lo:lo + 2048] = d.min(axis=1)
        d_gt = np.minimum(d_gt, d.min(axis=0))
    spacing = np.median(np.linalg.norm(np.diff(gt[:200], axis=0), axis=1))
    return dict(edge_points=int(len(pts)),
                med_dist3d=float(np.median(d_pt)),
                coverage=float((d_gt < 2 * spacing).mean()),
                coverage_4x=float((d_gt < 4 * spacing).mean()))


def run(n_views: int, width: int, height: int, n_ref: int,
        max_starting_views: int | None, verbose: bool = True,
        mesh_devices: int = 0):
    """Steady-state throughput: one warmup pass (same jit shapes — the
    padding budgets make every device program's shape independent of the
    refpoint count) triggers all compiles / executable loads, then the
    measured pass times the full workload.  The CPU probe goes through
    the identical warmup, so `vs_baseline` compares steady states.

    mesh_devices > 0 runs every sweep sharded over an n-device 1-D mesh
    (the scaling probe)."""
    import numpy as np

    from edgegraph3d_tpu.config import EdgeGraphConfig
    from edgegraph3d_tpu.pipeline import PipelineStats, run_pipeline

    mesh = None
    if mesh_devices:
        import jax

        from edgegraph3d_tpu.parallel import mesh as mesh_mod
        mesh = mesh_mod.make_mesh(mesh_devices,
                                  devices=jax.devices()[:mesh_devices])

    # padding budgets at the audited defaults (tools/capacity_audit.py:
    # zero drops on real dtu006), so the headline number reflects the
    # real-data configuration
    cfg = EdgeGraphConfig().replace(max_follow_steps=128)
    sfmd, edge_imgs, curves = build_workload(n_views, width, height, n_ref)

    # warmup: the FULL workload once, so the measured pass is pure
    # steady state — every compile, executable load, and transfer-shape
    # bucket is exercised by identical shapes (a subsampled warmup
    # leaves shape-dependent programs cold in the measured pass)
    t0 = time.time()
    warm_stats = PipelineStats()
    run_pipeline(sfmd, edge_imgs, cfg,
                 max_starting_views=max_starting_views, mesh=mesh,
                 stats=warm_stats)
    if verbose:
        print(f"warmup: {time.time() - t0:.2f}s; stage breakdown "
              f"(compile-inclusive):", file=sys.stderr)
        print(warm_stats.report(), file=sys.stderr)

    stats = PipelineStats()
    t0 = time.time()
    out = run_pipeline(sfmd, edge_imgs, cfg,
                       max_starting_views=max_starting_views, stats=stats,
                       mesh=mesh)
    wall = time.time() - t0
    qual = quality_metrics(out, sfmd, curves)
    if verbose:
        print(stats.report(), file=sys.stderr)
        print(f"total: {wall:.2f}s, edge-points: "
              f"{out.n_points - sfmd.n_points}, quality: {qual}",
              file=sys.stderr)
    return wall, qual


def scaling_probe(args):
    """views/s on 1 vs 8 virtual CPU devices (SURVEY §2.10 scaling
    target).  Honest caveat, printed with the number: virtual CPU
    devices SHARE the host's cores AND serialize trip-count-bound
    while_loop programs (each virtual device's follow walk runs its
    full iteration count back-to-back on the same silicon), so the
    sweep stages show no virtual speedup by construction.  The
    width-bound kernels (seed formation, expansion) run within ~2x of
    single-device on the same probe — the evidence that the mesh path
    adds little overhead — and real scaling needs real chips (the
    ICI-only collective design is validated by
    tests/test_sharded_pipeline.py parity and tests/test_multihost.py
    crossing a true process boundary)."""
    import subprocess
    results = {}
    for n in (1, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={n} "
                            + env.get("XLA_FLAGS", ""))
        cmd = [sys.executable, os.path.abspath(__file__), "--probe-cpu",
               "--views", str(args.views), "--width", str(args.width),
               "--height", str(args.height),
               "--refpoints-per-edge", str(args.refpoints_per_edge),
               "--max-starting-views", str(args.max_starting_views)]
        if n > 1:
            cmd += ["--mesh-devices", str(n)]
        out = subprocess.run(cmd, env=env, capture_output=True,
                             timeout=3600)
        line = out.stdout.decode().strip().splitlines()[-1]
        results[n] = json.loads(line)["value"]
        print(f"{n} virtual device(s): {results[n]} views/s",
              file=sys.stderr)
    eff = results[8] / (8 * results[1])
    print(json.dumps({
        "metric": "scaling_efficiency_8xvirtual_cpu",
        "value": round(eff, 4), "unit": "fraction",
        "vs_baseline": round(results[8] / results[1], 3),
        "note": "virtual CPU devices share host cores; measures mesh "
                "overhead/load balance, not silicon speedup"}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--height", type=int, default=1200)
    ap.add_argument("--refpoints-per-edge", type=int, default=48)
    ap.add_argument("--max-starting-views", type=int, default=2,
                    help="cap on starting views per refpoint; <= 0 "
                    "means uncapped (the reference's all-viewing-cams "
                    "loop, plg_matching_from_refpoints.cpp:64-81)")
    ap.add_argument("--probe-cpu", action="store_true",
                    help="force CPU backend and print raw views/s")
    ap.add_argument("--mesh-devices", type=int, default=0,
                    help="shard sweeps over an n-device mesh (with "
                    "--probe-cpu: virtual CPU devices)")
    ap.add_argument("--scaling-probe", action="store_true",
                    help="measure views/s at 1 vs 8 virtual CPU devices "
                    "and print a scaling-efficiency JSON line")
    args = ap.parse_args()

    if args.scaling_probe:
        scaling_probe(args)
        return

    import jax
    # persistent compile cache: the tunneled TPU pays 30-60s per cold
    # compile; the cache makes driver/bench runs steady-state
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.probe_cpu:
        jax.config.update("jax_platforms", "cpu")

    msv = args.max_starting_views if args.max_starting_views > 0 else None
    wall, qual = run(args.views, args.width, args.height,
                     args.refpoints_per_edge, msv,
                     mesh_devices=args.mesh_devices)
    views_per_s = args.views / wall

    if args.probe_cpu:
        print(f"CPU probe: {views_per_s:.4f} views/s "
              f"({wall:.1f}s, {qual})", file=sys.stderr)
        print(json.dumps({"metric": "views_per_s_cpu",
                          "value": round(views_per_s, 4),
                          "unit": "views/s", "vs_baseline": 1.0}))
        return

    baseline = CPU_BASELINE_VIEWS_PER_S
    vs = round(views_per_s / baseline, 3) if baseline else 1.0
    print(json.dumps({
        "metric": "views_per_s", "value": round(views_per_s, 4),
        "unit": "views/s", "vs_baseline": vs,
        "vs_frozen_r1_cpu": round(
            views_per_s / FROZEN_R1_CPU_VIEWS_PER_S, 3),
        "edge_points": qual["edge_points"],
        "med_dist3d": round(qual["med_dist3d"], 5),
        "coverage": round(qual["coverage"], 4),
        "coverage_4x": round(qual["coverage_4x"], 4),
        "max_starting_views": msv if msv is not None else "all"}))


if __name__ == "__main__":
    main()
