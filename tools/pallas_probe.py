"""Pallas prototype for the follow walk's hot gather (SURVEY §7 step 3
/ round-3 verdict stretch #9).

PROFILE.md puts `follow_seeds_bidirectional` at the HBM roofline: each
walk step gathers [S,3] polyline windows out of plg_coords [V,P,L,2].
This probe measures that gather three ways on the real device and
records whether a hand-written kernel (or a repacked layout) beats
XLA's gather:

  1. xla-nested:  rows from the PRODUCTION layout [V,P,L,2]
  2. xla-flat:    rows from a REPACKED layout [V*P, 2L] (one polyline =
                  one 128-lane vector row when L=64 — the "repacked
                  coordinate layout" idea)
  3. pallas-flat: the same flat gather as a Pallas kernel with
                  scalar-prefetched row indices (one DMA'd (1,128) row
                  per grid step, double-buffered by the pipeline)

Run:  python tools/pallas_probe.py [--cpu]   (prints one line each +
a verdict line; paste into PROFILE.md's Pallas section).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--S", type=int, default=16384,
                    help="gathered rows per step (seeds x 3 views)")
    ap.add_argument("--steps", type=int, default=64,
                    help="sequential walk steps to emulate")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    import numpy as np

    V, P, L = 8, 8192, 64
    S, T = args.S, args.steps
    rng = np.random.default_rng(0)
    coords = rng.standard_normal((V, P, L, 2)).astype(np.float32)
    flat = coords.reshape(V * P, 2 * L)          # one polyline per row
    cams = rng.integers(0, V, S).astype(np.int32)
    pls = rng.integers(0, P, S).astype(np.int32)
    rows = (cams.astype(np.int64) * P + pls).astype(np.int32)

    cj = jnp.asarray(coords)
    fj = jnp.asarray(flat)
    rj = jnp.asarray(rows)
    camj, plj = jnp.asarray(cams), jnp.asarray(pls)
    gbytes = S * 2 * L * 4 * T / 1e9

    def timed(fn, *a):
        out = np.asarray(fn(*a))                 # compile + fetch
        t0 = time.time()
        for _ in range(3):
            out = np.asarray(fn(*a))             # fetch forces the value
        return (time.time() - t0) / 3, out

    # a scan over T steps models the walk's sequential reads; indices
    # VARY per step (a fixed gather gets hoisted out of the loop by
    # XLA — measured "5988 GB/s", i.e. loop-invariant code motion, not
    # memory traffic); sum forces materialization
    @jax.jit
    def xla_nested(c, cams, pls):
        def body(carry, t):
            acc, = carry
            # DATA-DEPENDENT index chain (like the real walk): the
            # next gather depends on the previous values, so neither
            # hoisting nor sum(gather)=gather(rowsum) factoring applies
            p2 = (pls + t + acc.astype(jnp.int32)) % P
            g = c[cams, p2]                      # [S,L,2]
            return (acc + g.sum(axis=(1, 2)),), None
        (acc,), _ = jax.lax.scan(body, (jnp.zeros(S),),
                                 jnp.arange(T, dtype=jnp.int32))
        return acc

    @jax.jit
    def xla_flat(f, r):
        def body(carry, t):
            acc, = carry
            r2 = (r + t + acc.astype(jnp.int32)) % (V * P)
            g = f[r2]                            # [S,2L]
            return (acc + g.sum(axis=1),), None
        (acc,), _ = jax.lax.scan(body, (jnp.zeros(S),),
                                 jnp.arange(T, dtype=jnp.int32))
        return acc

    t1, o1 = timed(xla_nested, cj, camj, plj)
    print(f"xla-nested  [V,P,L,2] gather: {t1 * 1e3:7.1f} ms  "
          f"{gbytes / t1:6.1f} GB/s")
    t2, o2 = timed(xla_flat, fj, rj)
    print(f"xla-flat    [V*P,2L]  gather: {t2 * 1e3:7.1f} ms  "
          f"{gbytes / t2:6.1f} GB/s")
    # nested varies pl only within one cam row; flat varies the packed
    # row id — different index streams, so totals differ; no cross
    # check here (each path self-checks via the pallas comparison)

    # ---- pallas: DMA row gather, 8 gathered rows per grid step
    # (TPU tiling wants (8,128) blocks; arbitrary-row gathers go
    # through HBM-resident input + explicit async copies)
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(idx_ref, hbm_ref, out_ref, scratch, sem):
            i = pl.program_id(0)
            for k in range(8):                  # unrolled: 8 DMAs
                row = idx_ref[i * 8 + k]
                cp = pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(row, 1)], scratch.at[pl.ds(k, 1)],
                    sem)
                cp.start()
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(idx_ref[i * 8], 1)],
                scratch.at[pl.ds(0, 1)], sem).wait()
            for k in range(1, 8):
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(idx_ref[i * 8 + k], 1)],
                    scratch.at[pl.ds(k, 1)], sem).wait()
            out_ref[:] = scratch[:]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S // 8,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((8, 2 * L), lambda i, idx_ref: (i, 0)),
            scratch_shapes=[pltpu.VMEM((8, 2 * L), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )
        gather_p = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, 2 * L), jnp.float32))

        @jax.jit
        def pallas_flat(f, r):
            def body(carry, t):
                acc, = carry
                r2 = ((r + t + acc.astype(jnp.int32))
                      % (V * P)).astype(jnp.int32)
                g = gather_p(r2, f)
                return (acc + g.sum(axis=1),), None
            (acc,), _ = jax.lax.scan(body, (jnp.zeros(S),),
                                     jnp.arange(T, dtype=jnp.int32))
            return acc

        t3, o3 = timed(pallas_flat, fj, rj)
        np.testing.assert_allclose(np.asarray(o3), np.asarray(o2),
                                   rtol=3e-3, atol=1e-2)
        print(f"pallas-flat DMA gather      : {t3 * 1e3:7.1f} ms  "
              f"{gbytes / t3:6.1f} GB/s")
        verdict = ("pallas WINS" if t3 < 0.9 * t2 else
                   "pallas does NOT beat XLA"
                   if t3 < 1.5 * t2 else "pallas LOSES")
        print(f"verdict: {verdict} (pallas {t3 * 1e3:.1f} ms vs "
              f"xla-flat {t2 * 1e3:.1f} ms); layout repack "
              f"[V,P,L,2]->[V*P,2L]: {t1 / t2:.2f}x")
    except Exception as e:  # pallas unavailable on this backend/tunnel
        print(f"pallas-flat: UNAVAILABLE ({type(e).__name__}: {e})")
        print(f"verdict: layout repack [V,P,L,2]->[V*P,2L] alone: "
              f"{t1 / t2:.2f}x")


if __name__ == "__main__":
    main()
