"""Stage 3: edge reconstruction from SfM reference points.

TPU-native redesign of the reference's per-refpoint OpenMP loop
(reference: src/edgegraph3d/matching/plg_matching/plg_matching_from_refpoints.cpp:55-165
and matching/consensus_manager/plgpcm_3views_plg_following.cpp:40-69):

  per refpoint, per viewing cam, per nearby polyline intersection:
    1. detect starting intersections (<= 10 px) on the starting cam
    2. epipolar correspondences on the other viewing cams
       (radius = starting distance x 3)
    3. select 3 views: (min id, starting cam, max id) among views with
       candidates (parity: triangulation.cpp:1035-1066)
    4. cartesian candidate pairs -> triangulate + GN; require a UNIQUE
       valid seed (parity: compute_unique_potential_3d_points_3views_...
       triangulation.cpp:550-601)
    5. follow the seed both ways (following.py); seeds surviving < 2
       steps are dropped (parity: compatible_new_plg_point)
    6. expand every swept point to all other views by projection +
       grid lookup within 4 px (parity:
       expand_allpoints_to_other_view_using_plmap, triangulation.cpp:742-919,
       MAX_3DPOINT_PROJECTIONDISTSQ_EXPANDALLVIEWS = 16 px^2)

Data layout is DENSE over views: observations are [N, V] masked tensors,
and all grid work iterates views with `lax.map` so each step indexes one
view's grid/polylines concretely (a dynamic-slice, not a per-query
gather of whole grids).  The refpoint loop becomes a batch dimension;
chunks are jitted device sweeps with host-side compaction between
stages.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from edgegraph3d_tpu.config import DEFAULT_CONFIG, EdgeGraphConfig
from edgegraph3d_tpu.core.sfm import SfMData
from edgegraph3d_tpu.matching import detection, following
from edgegraph3d_tpu.matching import matches as matches_mod
from edgegraph3d_tpu.matching.grid import build_grids
from edgegraph3d_tpu.ops.geometry import all_fundamental_matrices, \
    project_depth
from edgegraph3d_tpu.ops.triangulation import gauss_newton_batched, \
    triangulate_dlt
from edgegraph3d_tpu.plgs.polyline_graph import PLGStack


@dataclass
class MatchingContext:
    """Device-resident inputs shared by all matching stages.

    With `mesh` set (a 1-D `jax.sharding.Mesh`), every sweep shards its
    work-item axis (refpoints / seeds / 3D points) over the mesh devices
    and replicates these context tensors — the TPU-native replacement of
    the reference's OpenMP refpoint loop (SURVEY.md §2.10)."""
    plg_coords: jnp.ndarray    # [V,P,L,2]
    plg_length: jnp.ndarray    # [V,P]
    grids: jnp.ndarray         # [V,GH,GW,K,2]
    P_mats: jnp.ndarray        # [V,3,4]
    F_table: jnp.ndarray       # [V,V,3,3]
    cell: float
    config: EdgeGraphConfig
    mesh: object = None        # jax.sharding.Mesh | None

    @property
    def n_shards(self) -> int:
        return self.mesh.size if self.mesh is not None else 1


def build_context(sfmd: SfMData, stack: PLGStack,
                  config: EdgeGraphConfig = DEFAULT_CONFIG,
                  cell: float = 10.0, mesh=None) -> MatchingContext:
    dtype = jnp.float32 if config.dtype == "float32" else jnp.float64
    P_mats = jnp.asarray(sfmd.P, dtype)
    F = all_fundamental_matrices(P_mats, jnp.asarray(sfmd.center, dtype))
    grids = build_grids(stack, sfmd.widths, sfmd.heights, cell,
                        config.grid_cell_capacity)
    ctx = MatchingContext(
        plg_coords=jnp.asarray(stack.coords, dtype),
        plg_length=jnp.asarray(stack.length),
        grids=jnp.asarray(grids),
        P_mats=P_mats,
        F_table=F,
        cell=cell,
        config=config,
        mesh=mesh,
    )
    if mesh is not None:
        # pin the replicated context on the mesh once so per-chunk sweeps
        # do not re-broadcast it
        from jax.sharding import NamedSharding, PartitionSpec
        rep = NamedSharding(mesh, PartitionSpec())
        for f in ("plg_coords", "plg_length", "grids", "P_mats",
                  "F_table"):
            setattr(ctx, f, jax.device_put(getattr(ctx, f), rep))
    return ctx


def dense_observations(sfmd: SfMData, dtype=np.float32):
    """Ragged per-point obs -> dense [N,V] tensors (obs_xy, obs_mask)."""
    N, V = sfmd.n_points, sfmd.n_cameras
    xy = np.zeros((N, V, 2), dtype=dtype)
    mask = np.zeros((N, V), dtype=bool)
    for n in range(N):
        for c, p in zip(sfmd.obs_cam[n], np.asarray(sfmd.obs_xy[n]).reshape(-1, 2)):
            xy[n, int(c)] = p
            mask[n, int(c)] = True
    return xy, mask


# ----------------------------------------------------------------------
# Seed formation (one refpoint-chunk sweep, jitted)
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnames=("M", "cfg"))
def _seed_sweep(plg_coords, plg_length, grids, P_mats, F_table,
                cell: float, obs_xy, obs_mask, start_mask, M: int,
                cfg: EdgeGraphConfig):
    """Form seeds for a chunk of refpoints.

    obs_xy [N,V,2], obs_mask [N,V], start_mask [N,V] (which views may act
    as the starting cam).  Returns per-(refpoint, starting-view,
    candidate) seed fields [N,V,M,...] + valid [N,V,M].
    """
    N, V = obs_mask.shape

    # 1. starting intersections per (refpoint, view)
    def start_view(v):
        def q(pt):
            return detection.detect_starting_intersections(
                grids[v], plg_coords[v], pt, cell,
                cfg.detection_starting_dist_px, M)
        return jax.vmap(q)(obs_xy[:, v])
    starts = jax.lax.map(start_view, jnp.arange(V))       # fields [V,N,M]
    starts = jax.tree.map(lambda a: jnp.moveaxis(a, 0, 1), starts)
    s_valid = starts.valid & start_mask[..., None]        # [N,V,M]

    # 2. epipolar lines of each starting candidate into every other view
    xyh = jnp.concatenate(
        [starts.xy, jnp.ones(starts.xy.shape[:-1] + (1,),
                             starts.xy.dtype)], axis=-1)  # [N,V,M,3]
    lines = jnp.einsum("abij,namj->nambi", F_table, xyh,
                       precision=jax.lax.Precision.HIGHEST)  # [N,Vs,M,Vo,3]
    lnorm = jnp.sqrt(lines[..., 0] ** 2 + lines[..., 1] ** 2)
    lines = lines / jnp.maximum(lnorm, 1e-20)[..., None]

    radius = jnp.minimum(starts.dist * cfg.detection_correspondence_factor,
                         3.0 * cfg.detection_starting_dist_px)
    radius = jnp.maximum(radius, cfg.detection_starting_dist_px * 0.3)

    # 3. correspondences: iterate target views, vmap over (n, vs, m)
    def corr_view(vo):
        def q(pt, line, rad):
            return detection.detect_epipolar_correspondences(
                grids[vo], plg_coords[vo], pt, line, cell, rad, M)
        pt = jnp.broadcast_to(obs_xy[:, vo][:, None, None, :], (N, V, M, 2))
        line = lines[:, :, :, vo]
        flat = jax.vmap(q)(pt.reshape(-1, 2), line.reshape(-1, 3),
                           radius.reshape(-1))
        return jax.tree.map(
            lambda a: a.reshape((N, V, M) + a.shape[1:]), flat)
    corr = jax.lax.map(corr_view, jnp.arange(V))          # fields [Vo,N,Vs,M,Mc]
    corr = jax.tree.map(lambda a: jnp.moveaxis(a, 0, 3), corr)  # [N,Vs,M,Vo,Mc]

    not_self = ~jnp.eye(V, dtype=bool)                    # [Vs,Vo]
    corr_ok = corr.valid & obs_mask[:, None, None, :, None] \
        & not_self[None, :, None, :, None] & s_valid[..., None, None]

    # 4. select (min view id, starting, max view id) among views with
    #    >= 1 correspondence
    view_has = jnp.any(corr_ok, axis=-1)                  # [N,Vs,M,Vo]
    vids = jnp.arange(V)
    big = jnp.int32(10 ** 6)
    v1 = jnp.argmin(jnp.where(view_has, vids, big), axis=-1)   # [N,Vs,M]
    v2 = jnp.argmax(jnp.where(view_has, vids, -1), axis=-1)
    two_views = (jnp.sum(view_has, axis=-1) >= 2) & (v1 != v2)

    def gather_view(arr, v):
        return jnp.take_along_axis(
            arr, v[..., None].reshape(v.shape + (1,) * (arr.ndim - v.ndim)),
            axis=3).squeeze(3)

    c1 = jax.tree.map(lambda a: gather_view(a, v1), corr)  # [N,Vs,M,Mc]
    c2 = jax.tree.map(lambda a: gather_view(a, v2), corr)
    c1_ok = gather_view(corr_ok, v1)
    c2_ok = gather_view(corr_ok, v2)

    # 5. triangulate all candidate pairs; unique valid seed required
    cam_s = jnp.broadcast_to(vids[None, :, None], (N, V, M))
    cams3 = jnp.stack([cam_s, v1, v2], axis=-1)            # [N,V,M,3]
    P3 = P_mats[cams3]                                     # [N,V,M,3,3,4]

    pair_xy = jnp.stack([
        jnp.broadcast_to(starts.xy[..., None, None, :], (N, V, M, M, M, 2)),
        jnp.broadcast_to(c1.xy[..., :, None, :], (N, V, M, M, M, 2)),
        jnp.broadcast_to(c2.xy[..., None, :, :], (N, V, M, M, M, 2)),
    ], axis=-2)                                            # [N,V,M,M,M,3,2]
    P_pairs = jnp.broadcast_to(P3[..., None, None, :, :, :],
                               (N, V, M, M, M, 3, 3, 4))
    flat_xy = pair_xy.reshape(-1, 3, 2)
    flat_P = P_pairs.reshape(-1, 3, 3, 4)
    mask3 = jnp.ones(flat_xy.shape[:2], dtype=bool)
    X0 = triangulate_dlt(flat_P, flat_xy, mask3)
    X, mse, ok = gauss_newton_batched(
        flat_P, flat_xy, mask3, X0, max_iters=cfg.gn_max_iters,
        accept_mse=cfg.match_gn_max_mse, epsilon=cfg.gn_epsilon)
    X = X.reshape(N, V, M, M, M, 3)
    ok = ok.reshape(N, V, M, M, M)
    ok = ok & c1_ok[..., :, None] & c2_ok[..., None, :] \
        & two_views[..., None, None]

    n_valid = jnp.sum(ok.reshape(N, V, M, -1), axis=-1)
    unique = n_valid == 1
    pick = jnp.argmax(ok.reshape(N, V, M, -1), axis=-1)
    i1 = pick // M
    i2 = pick % M

    def pick_cand(arr, idx):
        return jnp.take_along_axis(
            arr, idx[..., None].reshape(idx.shape + (1,) * (arr.ndim - idx.ndim)),
            axis=3).squeeze(3)

    seed_X = jnp.take_along_axis(
        X.reshape(N, V, M, -1, 3), pick[..., None, None], axis=3).squeeze(3)
    seed_valid = unique & s_valid & two_views

    sel1 = jax.tree.map(lambda a: pick_cand(a, i1), c1)
    sel2 = jax.tree.map(lambda a: pick_cand(a, i2), c2)
    pl3 = jnp.stack([starts.pl_id, sel1.pl_id, sel2.pl_id], axis=-1)
    seg3 = jnp.stack([starts.seg, sel1.seg, sel2.seg], axis=-1)
    t3 = jnp.stack([starts.t, sel1.t, sel2.t], axis=-1)
    xy3 = jnp.stack([starts.xy, sel1.xy, sel2.xy], axis=-2)

    return dict(cams=cams3, pl_id=pl3, seg=seg3, t=t3, xy=xy3,
                X=seed_X, valid=seed_valid)


# ----------------------------------------------------------------------
# Expansion to all views
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def _expand_sweep(plg_coords, grids, P_mats, cell: float, X,
                  cfg: EdgeGraphConfig):
    """Project points into every view and attach observations where the
    projection lands within sqrt(expand_max_projection_distsq) of a
    polyline.  X [Np,3] -> obs_xy [Np,V,2], obs_ok [Np,V]."""
    V = P_mats.shape[0]
    proj, depth = project_depth(P_mats[None, :], X[:, None, :])  # [Np,V,2]

    def view_q(v):
        def q(pt):
            return detection.detect_starting_intersections(
                grids[v], plg_coords[v], pt, cell,
                float(np.sqrt(cfg.expand_max_projection_distsq)), 1)
        return jax.vmap(q)(proj[:, v])
    cand = jax.lax.map(view_q, jnp.arange(V))      # fields [V,Np,1]
    obs_xy = jnp.moveaxis(cand.xy[..., 0, :], 0, 1)       # [Np,V,2]
    obs_ok = jnp.moveaxis(cand.valid[..., 0], 0, 1) & (depth > 0)
    return obs_xy, obs_ok


# ----------------------------------------------------------------------
# Full stage-3 driver
# ----------------------------------------------------------------------

@dataclass
class EdgePoints:
    """Host-side reconstruction result.

    (seed_id, chain_order) identify the swept 3D chains: points of one
    seed sorted by chain_order form a 3D polyline (backward sweep,
    seed point, forward sweep)."""
    X: np.ndarray          # [M,3]
    obs_xy: np.ndarray     # [M,V,2]
    obs_mask: np.ndarray   # [M,V]
    seed_refpoint: np.ndarray  # [M] originating refpoint id
    seed_id: np.ndarray = None       # [M] global seed index
    chain_order: np.ndarray = None   # [M] order along the chain

    def __post_init__(self):
        if self.seed_id is None:
            self.seed_id = np.zeros(len(self.X), np.int64)
        if self.chain_order is None:
            self.chain_order = np.zeros(len(self.X), np.int64)

    def select(self, keep: np.ndarray) -> "EdgePoints":
        return EdgePoints(X=self.X[keep], obs_xy=self.obs_xy[keep],
                          obs_mask=self.obs_mask[keep],
                          seed_refpoint=self.seed_refpoint[keep],
                          seed_id=self.seed_id[keep],
                          chain_order=self.chain_order[keep])


def _empty_points(V: int) -> EdgePoints:
    return EdgePoints(X=np.zeros((0, 3)), obs_xy=np.zeros((0, V, 2)),
                      obs_mask=np.zeros((0, V), bool),
                      seed_refpoint=np.zeros(0, np.int64))


@partial(jax.jit, static_argnames=("cap",))
def _pack_seed_outputs(out: dict, cap: int):
    """Compact valid seeds on device into one [cap, 22] buffer:
    [cams(3), pl_id(3), seg(3), t(3), xy(6), X(3), refpoint_row(1)].
    See ops/compaction.py for why (tunnel bandwidth)."""
    from edgegraph3d_tpu.ops.compaction import compact_rows
    N, V, M = out["valid"].shape
    f = out["xy"].dtype
    ridx = jnp.broadcast_to(jnp.arange(N, dtype=f)[:, None, None],
                            (N, V, M))
    payload = jnp.concatenate([
        out["cams"].astype(f), out["pl_id"].astype(f),
        out["seg"].astype(f), out["t"].astype(f),
        out["xy"].reshape(N, V, M, 6), out["X"],
        ridx[..., None]], axis=-1).reshape(N * V * M, 22)
    return compact_rows(out["valid"].reshape(-1), payload, cap)


def compute_seeds(sfmd: SfMData, ctx: MatchingContext,
                  refpoint_chunk: int = 256,
                  max_starting_views: int | None = None):
    """Phase A: form + host-compact seeds for all refpoints."""
    cfg = ctx.config
    M = cfg.max_candidates_per_view
    refpoint_chunk = -(-refpoint_chunk // ctx.n_shards) * ctx.n_shards
    obs_xy, obs_mask = dense_observations(sfmd)
    N = len(obs_xy)
    start_mask = obs_mask.copy()
    if max_starting_views is not None:
        cum = np.cumsum(obs_mask, axis=1)
        start_mask &= cum <= max_starting_views

    seeds_acc = {k: [] for k in ("cams", "pl_id", "seg", "t", "xy", "X")}
    seed_ref = []
    for lo in range(0, N, refpoint_chunk):
        hi = min(lo + refpoint_chunk, N)
        pad = refpoint_chunk - (hi - lo)
        ox = np.pad(obs_xy[lo:hi], ((0, pad), (0, 0), (0, 0)))
        om = np.pad(obs_mask[lo:hi], ((0, pad), (0, 0)))
        sm = np.pad(start_mask[lo:hi], ((0, pad), (0, 0)))
        if ctx.mesh is not None:
            from edgegraph3d_tpu.parallel import sharded
            out = sharded.sharded_seed_sweep(
                ctx.mesh, ctx.plg_coords, ctx.plg_length, ctx.grids,
                ctx.P_mats, ctx.F_table, ctx.cell, jnp.asarray(ox),
                jnp.asarray(om), jnp.asarray(sm), M, cfg)
        else:
            out = _seed_sweep(ctx.plg_coords, ctx.plg_length, ctx.grids,
                              ctx.P_mats, ctx.F_table, ctx.cell,
                              jnp.asarray(ox), jnp.asarray(om),
                              jnp.asarray(sm), M, cfg)
        cap = 8 * refpoint_chunk
        buf, n = _pack_seed_outputs(out, cap)
        from edgegraph3d_tpu.ops.compaction import to_host
        if int(n) > cap:    # rare dense chunk: repack at full width
            buf, n = _pack_seed_outputs(
                out, int(np.prod(out["valid"].shape)))
        rows, n_int = to_host(buf, n)
        if n_int == 0:
            continue
        seeds_acc["cams"].append(rows[:, 0:3].astype(np.int32))
        seeds_acc["pl_id"].append(rows[:, 3:6].astype(np.int32))
        seeds_acc["seg"].append(rows[:, 6:9].astype(np.int32))
        seeds_acc["t"].append(rows[:, 9:12])
        seeds_acc["xy"].append(rows[:, 12:18].reshape(-1, 3, 2))
        seeds_acc["X"].append(rows[:, 18:21])
        seed_ref.append(lo + rows[:, 21].astype(np.int64))

    if not seed_ref:
        return None, None
    seeds_np = {k: np.concatenate(v) for k, v in seeds_acc.items()}
    return seeds_np, np.concatenate(seed_ref)


def sweep_seeds(seeds_np: dict, seed_ref: np.ndarray,
                ctx: MatchingContext,
                manager: "matches_mod.MatchesManager",
                seed_chunk: int = 2048, seed_id_offset: int = 0):
    """Phase B shared by all stages: dedup seeds against `manager`,
    follow them bidirectionally, claim swept intervals, and collect the
    emitted chain points.  Returns (X, obs3, cams3, refs, seed_ids,
    orders) or None."""
    cfg = ctx.config
    V = ctx.P_mats.shape[0]
    seed_chunk = -(-seed_chunk // ctx.n_shards) * ctx.n_shards
    # within-batch seed dedup: one seed per starting-interval bucket
    # (parity: the reference skips seeds on already-matched intervals,
    # polyline_matching.cpp:173-190)
    keep0 = matches_mod.dedup_seed_keys(
        seeds_np["cams"], seeds_np["pl_id"], seeds_np["seg"],
        seeds_np["t"], np.asarray(ctx.plg_length))
    seeds_np = {k: v[keep0] for k, v in seeds_np.items()}
    seed_ref = seed_ref[keep0]
    S = len(seed_ref)

    # ---- follow, chunked over seeds (chunk-order claiming)
    all_X, all_obs3, all_cams3, all_ref = [], [], [], []
    all_seed, all_order = [], []
    for lo in range(0, S, seed_chunk):
        hi = min(lo + seed_chunk, S)
        pad = seed_chunk - (hi - lo)
        # cross-chunk dedup: drop seeds whose starting interval was
        # claimed by an earlier chunk
        fresh = ~manager.is_matched(
            seeds_np["cams"][lo:hi, 0], seeds_np["pl_id"][lo:hi, 0],
            seeds_np["seg"][lo:hi, 0], seeds_np["t"][lo:hi, 0])

        def padded(k, fill=0):
            a = seeds_np[k][lo:hi]
            return jnp.asarray(np.pad(
                a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                constant_values=fill))
        seeds = following.SeedTuple(
            cams=padded("cams"), pl_id=padded("pl_id"), seg=padded("seg"),
            t=padded("t"), xy=padded("xy"), X=padded("X"),
            valid=jnp.asarray(np.pad(fresh, (0, pad))))
        if ctx.mesh is not None:
            from edgegraph3d_tpu.parallel import sharded
            fwd, bwd, total_dev = sharded.sharded_follow_bidirectional(
                ctx.mesh, seeds, ctx.plg_coords, ctx.plg_length,
                ctx.P_mats, ctx.F_table, cfg, cfg.max_follow_steps)
        else:
            fwd, bwd, total_dev = following.follow_seeds_bidirectional(
                seeds, ctx.plg_coords, ctx.plg_length, ctx.P_mats,
                ctx.F_table, cfg, cfg.max_follow_steps)
        # compact emitted points on device: 2 transfers per chunk
        # instead of ~20 padded ones (the tunnel moves ~30 MB/s)
        cap = 32 * seed_chunk
        buf, n_emit, meta = following.pack_follow_outputs(
            fwd, bwd, seeds.valid, cfg.new_point_min_steps, cap)
        if int(n_emit) > cap:
            # dense chunk: repack at full width (2 directions x S x T
            # rows) like the seed-sweep call sites; checked BEFORE any
            # interval claiming so the manager state stays consistent
            cap = 2 * seed_chunk * cfg.max_follow_steps
            buf, n_emit, meta = following.pack_follow_outputs(
                fwd, bwd, seeds.valid, cfg.new_point_min_steps, cap)
        meta = np.asarray(meta)
        total = meta[:, 0].astype(np.int64)
        keep_seed = (total >= cfg.new_point_min_steps) & np.pad(
            fresh, (0, pad))

        # claim swept arcs on all tuple views
        ks_all = np.flatnonzero(keep_seed)
        ks_all = ks_all[ks_all < hi - lo]
        cams_np = seeds_np["cams"][lo:hi]
        pl_np = seeds_np["pl_id"][lo:hi]
        seg_np = seeds_np["seg"][lo:hi]
        t_np = seeds_np["t"][lo:hi]
        for off in (1, 7):     # meta cols: fwd seg/t at 1:7, bwd at 7:13
            fs = meta[:, off:off + 3]
            ft = meta[:, off + 3:off + 6]
            for k in range(3):
                manager.mark_spans(
                    cams_np[ks_all, k], pl_np[ks_all, k],
                    seg_np[ks_all, k], t_np[ks_all, k],
                    fs[ks_all, k].astype(np.int64), ft[ks_all, k])

        from edgegraph3d_tpu.ops.compaction import to_host
        rows, n_int = to_host(buf, n_emit)
        if n_int:
            sidx = rows[:, 9].astype(np.int64)
            all_X.append(rows[:, 0:3].astype(np.float64))
            all_obs3.append(rows[:, 3:9].reshape(-1, 3, 2))
            all_cams3.append(cams_np[sidx])
            all_ref.append(seed_ref[lo + sidx])
            all_seed.append(lo + sidx)
            all_order.append(rows[:, 10].astype(np.int64))
        if len(ks_all):   # the seed points themselves (order 0)
            all_X.append(seeds_np["X"][lo:hi][ks_all])
            all_obs3.append(seeds_np["xy"][lo:hi][ks_all])
            all_cams3.append(cams_np[ks_all])
            all_ref.append(seed_ref[lo + ks_all])
            all_seed.append(lo + ks_all)
            all_order.append(np.zeros(len(ks_all), np.int64))

    if not all_X:
        return None

    return (np.concatenate(all_X), np.concatenate(all_obs3),
            np.concatenate(all_cams3), np.concatenate(all_ref),
            np.concatenate(all_seed) + seed_id_offset,
            np.concatenate(all_order))


def expand_and_assemble(ctx: MatchingContext, X, obs3, cams3, refs,
                        seed_ids, orders) -> EdgePoints:
    """Phase C shared by all stages: expand every point to all views and
    assemble the EdgePoints result."""
    cfg = ctx.config
    V = ctx.P_mats.shape[0]
    Np = len(X)
    obs_xy = np.zeros((Np, V, 2), dtype=np.float32)
    obs_mask = np.zeros((Np, V), dtype=bool)
    chunk = -(-4096 // ctx.n_shards) * ctx.n_shards
    for lo in range(0, Np, chunk):
        hi = min(lo + chunk, Np)
        pad = chunk - (hi - lo)
        Xc = jnp.asarray(np.pad(X[lo:hi].astype(np.float32),
                                ((0, pad), (0, 0))))
        if ctx.mesh is not None:
            from edgegraph3d_tpu.parallel import sharded
            exy, eok = sharded.sharded_expand(
                ctx.mesh, ctx.plg_coords, ctx.grids, ctx.P_mats,
                ctx.cell, Xc, cfg)
        else:
            exy, eok = _expand_sweep(ctx.plg_coords, ctx.grids,
                                     ctx.P_mats, ctx.cell, Xc, cfg)
        # one packed transfer per chunk (xy + mask): transfer count is
        # what the tunnel charges for (see ops/compaction.py)
        S = exy.shape[0]
        packed = np.asarray(jnp.concatenate(
            [exy.reshape(S, -1), eok.astype(exy.dtype)], axis=1))
        obs_xy[lo:hi] = packed[: hi - lo, : V * 2].reshape(-1, V, 2)
        obs_mask[lo:hi] = packed[: hi - lo, V * 2:] > 0.5
    # tuple views: exact tracked coordinates override the expansion
    for k in range(3):
        obs_xy[np.arange(Np), cams3[:, k]] = obs3[:, k]
        obs_mask[np.arange(Np), cams3[:, k]] = True

    return EdgePoints(X=X, obs_xy=obs_xy, obs_mask=obs_mask,
                      seed_refpoint=refs, seed_id=seed_ids,
                      chain_order=orders)


def reconstruct_from_refpoints(
    sfmd: SfMData, ctx: MatchingContext,
    refpoint_chunk: int = 256, seed_chunk: int = 2048,
    max_starting_views: int | None = None,
    manager: "matches_mod.MatchesManager | None" = None,
    seed_id_offset: int = 0,
) -> EdgePoints:
    """Run stage 3 over all refpoints (parity:
    plg_matching_from_refpoints_parallel, plg_matching_from_refpoints.cpp:83-165).
    """
    V = ctx.P_mats.shape[0]
    seeds_np, seed_ref = compute_seeds(sfmd, ctx, refpoint_chunk,
                                       max_starting_views)
    if seeds_np is None:
        return _empty_points(V)
    if manager is None:
        manager = matches_mod.MatchesManager(np.asarray(ctx.plg_length))
    res = sweep_seeds(seeds_np, seed_ref, ctx, manager, seed_chunk,
                      seed_id_offset)
    if res is None:
        return _empty_points(V)
    return expand_and_assemble(ctx, *res)
