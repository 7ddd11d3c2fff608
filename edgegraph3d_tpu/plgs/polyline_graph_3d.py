"""3D polyline graphs: assembly, fragmentation, serialization.

TPU-native replacement for the reference's `PolyLineGraph3D[HMapImpl]`
(reference: include/edgegraph3d/plgs/polyline_graph_3d.hpp:66-252,
src/edgegraph3d/plgs/polyline_graph_3d.cpp, polyline_graph_3d_hmap_impl.cpp:47-193):
same padded struct-of-arrays layout as the 2D graphs but with vec3
coords and per-point 2D observations; chains come straight from the
follow sweeps (EdgePoints.seed_id / chain_order) instead of incremental
`add_direct_connection` node-map updates.  Serialized as npz
("outgraph.3dg" equivalent, reference: pipelines.cpp:233,
global_defines.hpp:44 PLG3D_OUTNAME).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class PLG3D:
    """Padded 3D polyline graph with per-point observations."""

    coords: np.ndarray       # [P, L, 3] float32
    length: np.ndarray       # [P] int32
    obs_mask: np.ndarray     # [P, L, V] bool — observing views per point
    obs_xy: np.ndarray       # [P, L, V, 2] float32

    @property
    def n_polylines(self) -> int:
        return int((self.length >= 2).sum())

    @property
    def valid(self) -> np.ndarray:
        return self.length >= 2

    def polyline(self, p: int) -> np.ndarray:
        return self.coords[p, : self.length[p]]

    def total_lengths(self) -> np.ndarray:
        d = np.linalg.norm(np.diff(self.coords, axis=1), axis=-1)
        idx = np.arange(self.coords.shape[1] - 1)[None, :]
        d = d * (idx < (self.length[:, None] - 1))
        return d.sum(axis=1)

    # ------------------------------------------------------------------
    def fragment(self, max_len: float) -> "PLG3D":
        """Split segments longer than `max_len` by inserting midpoints
        (parity: PolyLineGraph3D::fragment, polyline_graph_3d.cpp:99-131).
        Inserted points carry no observations."""
        out_chains, out_obs = [], []
        for p in np.flatnonzero(self.valid):
            pts = [self.coords[p, 0]]
            obs = [(self.obs_mask[p, 0], self.obs_xy[p, 0])]
            for i in range(1, self.length[p]):
                a = self.coords[p, i - 1]
                b = self.coords[p, i]
                d = np.linalg.norm(b - a)
                n_sub = int(np.ceil(d / max_len))
                for k in range(1, n_sub):
                    pts.append(a + (b - a) * (k / n_sub))
                    obs.append((np.zeros_like(self.obs_mask[p, 0]),
                                np.zeros_like(self.obs_xy[p, 0])))
                pts.append(b)
                obs.append((self.obs_mask[p, i], self.obs_xy[p, i]))
            out_chains.append(np.asarray(pts))
            out_obs.append(obs)
        return from_chain_list(out_chains, out_obs,
                               n_views=self.obs_mask.shape[2])

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        np.savez_compressed(path, coords=self.coords, length=self.length,
                            obs_mask=self.obs_mask, obs_xy=self.obs_xy)

    @staticmethod
    def load(path: str) -> "PLG3D":
        z = np.load(path)
        return PLG3D(coords=z["coords"], length=z["length"],
                     obs_mask=z["obs_mask"], obs_xy=z["obs_xy"])


def from_chain_list(chains, obs=None, n_views: int = 0,
                    max_len: int | None = None) -> PLG3D:
    """chains: list of [n_i,3]; obs: list of [(mask [V], xy [V,2])]."""
    if max_len is None:
        max_len = max((len(c) for c in chains), default=2)
    P = max(len(chains), 1)
    coords = np.zeros((P, max_len, 3), dtype=np.float32)
    length = np.zeros(P, dtype=np.int32)
    om = np.zeros((P, max_len, n_views), dtype=bool)
    oxy = np.zeros((P, max_len, n_views, 2), dtype=np.float32)
    for i, c in enumerate(chains):
        k = min(len(c), max_len)
        coords[i, :k] = c[:k]
        length[i] = k
        if obs is not None:
            for j in range(k):
                m, xy = obs[i][j]
                om[i, j] = m
                oxy[i, j] = xy
    return PLG3D(coords=coords, length=length, obs_mask=om, obs_xy=oxy)


def assemble_from_edge_points(pts, n_views: int,
                              max_len: int = 512) -> PLG3D:
    """Build the 3D graph from the follow-sweep output: points of each
    seed, ordered by chain_order, form one 3D polyline (parity with the
    reference's incremental PLG3D build during following,
    plg_matches_manager.cpp:110-180)."""
    if len(pts.X) == 0:
        return from_chain_list([], n_views=n_views)
    order = np.lexsort((pts.chain_order, pts.seed_id))
    sid = pts.seed_id[order]
    bounds = np.flatnonzero(np.diff(sid)) + 1
    groups = np.split(order, bounds)
    chains, obs = [], []
    for g in groups:
        if len(g) < 2:
            continue
        chains.append(pts.X[g])
        obs.append([(pts.obs_mask[i], pts.obs_xy[i]) for i in g])
    return from_chain_list(chains, obs, n_views=n_views, max_len=max_len)
