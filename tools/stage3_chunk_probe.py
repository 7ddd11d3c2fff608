"""Round-5 probe: per-phase device time of ONE stage-3 chunk at full
scale, on REAL scene data (49 views @1600x1200, 6268 refpoints).

Times, separately jitted with block_until_ready between:
  A. _start_sweep           (starting-intersection detection, compacted)
  B. _seed_from_starts      (epipolar correspondences + 3-view seeding)
  C. follow_seeds_bidirectional  (12-config resolve + walk + GN + ...)
  D. pack_follow_outputs
  E. _seed_follow_fused     (the production megakernel, A+B+C+D fused)

Usage: python tools/stage3_chunk_probe.py [--chunk 256]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(label, fn, *args, n=2):
    """block_until_ready through the axon tunnel returns before the
    remote compute is visible (measured: 0.3 ms for a kernel the fused
    total shows costs seconds) — force a 1-element FETCH of every
    output leaf instead; a fetch cannot complete before its producer."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def force(out):
        for leaf in jax.tree.leaves(out):
            np.asarray(jnp.ravel(leaf)[:1])

    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        force(out)
    print(f"{label}: {(time.time()-t0)/n*1e3:9.1f} ms", flush=True)
    return out


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import build_full_workload
    from edgegraph3d_tpu.config import EdgeGraphConfig
    from edgegraph3d_tpu.matching import following
    from edgegraph3d_tpu.matching import refpoints as rp
    from edgegraph3d_tpu.plgs.extraction import extract_plgs

    chunk = int(sys.argv[sys.argv.index("--chunk") + 1]) \
        if "--chunk" in sys.argv else 256
    cfg = EdgeGraphConfig().replace(max_follow_steps=128)
    M = cfg.max_candidates_per_view

    t0 = time.time()
    sfmd, edge_imgs, _ = build_full_workload()
    stack = extract_plgs(edge_imgs, cfg)
    ctx = rp.build_context(sfmd, stack, cfg)
    obs_xy, obs_mask = rp.dense_observations(sfmd)
    print(f"scene+context: {time.time()-t0:.1f}s "
          f"(backend={jax.default_backend()})", flush=True)

    N, V = obs_mask.shape
    est = 2.0 * float(obs_mask.sum(axis=1).mean()) * chunk
    cap_s = min(chunk * V * M, max(1024, 1 << max(int(est) - 1, 1)
                                   .bit_length()))
    cap_rows = 32 * cap_s
    print(f"chunk={chunk} cap_s={cap_s} cap_rows={cap_rows}", flush=True)

    ox = jnp.asarray(obs_xy[:chunk])
    om = jnp.asarray(obs_mask[:chunk])
    sm = om

    sbuf, ns = bench(
        "A _start_sweep          ",
        lambda: rp._start_sweep(ctx.plg_coords, ctx.grids, ctx.cell, ox,
                                sm, cfg.detection_starting_dist_px, M,
                                cap_s))
    buf, n_seeds = bench(
        "B _seed_from_starts     ",
        lambda: rp._seed_from_starts(
            ctx.plg_coords, ctx.plg_length, ctx.grids, ctx.P_mats,
            ctx.F_table, ctx.cell, sbuf, ns, ox, om, M, cfg, cap_s))
    from edgegraph3d_tpu.ops.compaction import to_host
    _, n_int = to_host(buf, n_seeds)
    print(f"  starts={int(np.asarray(jnp.reshape(ns,(1,)))[0])} "
          f"seeds={n_int}", flush=True)

    seeds = following.SeedTuple(
        cams=buf[:, 0:3].astype(jnp.int32),
        pl_id=buf[:, 3:6].astype(jnp.int32),
        seg=buf[:, 6:9].astype(jnp.int32),
        t=buf[:, 9:12],
        xy=buf[:, 12:18].reshape(cap_s, 3, 2),
        X=buf[:, 18:21],
        valid=jnp.arange(cap_s) < n_seeds)

    res = bench(
        "C follow bidirectional  ",
        lambda: following.follow_seeds_bidirectional(
            seeds, ctx.plg_coords, ctx.plg_length, ctx.P_mats,
            ctx.F_table, cfg, cfg.max_follow_steps))
    fwd, bwd, _ = res
    print(f"  chain points: {int(np.asarray(fwd.n_steps).sum() + np.asarray(bwd.n_steps).sum())}, "
          f"gn_overflow={int(np.asarray(fwd.gn_overflow).max())}",
          flush=True)

    bench(
        "D pack_follow_outputs   ",
        lambda: following.pack_follow_outputs(
            fwd, bwd, seeds.valid, cfg.new_point_min_steps, cap_rows))

    bench(
        "E fused megakernel      ",
        lambda: rp._seed_follow_fused(
            ctx.plg_coords, ctx.plg_length, ctx.grids, ctx.P_mats,
            ctx.F_table, ctx.cell, ox, om, sm, M, cfg, cap_s, cap_rows),
        n=2)


if __name__ == "__main__":
    main()
