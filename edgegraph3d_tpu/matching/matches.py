"""Matched-interval bookkeeping: the dedup layer.

TPU-native replacement for the reference's lock-guarded
`PLGMatchesManager` (reference: src/edgegraph3d/matching/plg_matching/
plg_matches_manager.cpp:54-195 — per-(plg, polyline) sorted interval
sets with `is_matched` queries and `add_matched_3dsegment` updates under
one `omp_lock`).  Here the interval sets are dense arc-length bucket
rasters [V, P, B]:

  * `is_matched`  — a gather
  * `mark`        — a scatter-max
  * parallel claiming is deterministic: seeds are processed in chunks in
    index order; within-chunk duplicates are removed up front by bucket
    keys, across chunks by the raster (mirroring the reference's
    sequential skip of already-matched intervals,
    polyline_matching.cpp:173-190)

Buckets are indexed by coordinate position (segment index scaled to B),
which is monotone along the chain — adequate resolution at B=64 for
polylines capped at 256 coords.
"""

from __future__ import annotations

import numpy as np


class MatchesManager:
    """Host-side interval raster over all views' polylines."""

    def __init__(self, n_views: int, n_polylines: int, n_coords: int,
                 buckets: int = 64):
        self.B = buckets
        self.L = n_coords
        self.raster = np.zeros((n_views, n_polylines, buckets), dtype=bool)

    def bucket(self, seg: np.ndarray, t: np.ndarray) -> np.ndarray:
        pos = (seg + np.clip(t, 0.0, 1.0)) / max(self.L - 1, 1)
        return np.clip((pos * self.B).astype(np.int64), 0, self.B - 1)

    def is_matched(self, view: np.ndarray, pl: np.ndarray,
                   seg: np.ndarray, t: np.ndarray) -> np.ndarray:
        b = self.bucket(seg, t)
        return self.raster[view, pl, b]

    def mark_points(self, view: np.ndarray, pl: np.ndarray,
                    seg: np.ndarray, t: np.ndarray) -> None:
        b = self.bucket(seg, t)
        self.raster[view, pl, b] = True

    def mark_spans(self, view: np.ndarray, pl: np.ndarray,
                   seg_a: np.ndarray, t_a: np.ndarray,
                   seg_b: np.ndarray, t_b: np.ndarray) -> None:
        """Mark whole arcs between two positions (parity:
        add_matched_3dsegment marking the 2D interval,
        plg_matches_manager.cpp:110-173)."""
        ba = self.bucket(seg_a, t_a)
        bb = self.bucket(seg_b, t_b)
        lo = np.minimum(ba, bb)
        hi = np.maximum(ba, bb)
        # vectorized span fill: outer comparison against bucket axis
        rng = np.arange(self.B)
        span = (rng[None, :] >= lo[:, None]) & (rng[None, :] <= hi[:, None])
        np.logical_or.at(self.raster, (view, pl), span)


def dedup_seed_keys(cams: np.ndarray, pl_id: np.ndarray, seg: np.ndarray,
                    t: np.ndarray, n_polylines: int, n_coords: int,
                    buckets: int = 64) -> np.ndarray:
    """Within-batch seed dedup: one seed per (view, polyline, bucket)
    triple of its STARTING view; keeps the first (lowest index).

    Returns a boolean keep mask."""
    pos = (seg[:, 0] + np.clip(t[:, 0], 0, 1)) / max(n_coords - 1, 1)
    b = np.clip((pos * buckets).astype(np.int64), 0, buckets - 1)
    key = (cams[:, 0].astype(np.int64) * n_polylines
           + pl_id[:, 0]) * buckets + b
    _, first = np.unique(key, return_index=True)
    keep = np.zeros(len(key), dtype=bool)
    keep[first] = True
    return keep
