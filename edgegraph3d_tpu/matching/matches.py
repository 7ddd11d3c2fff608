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

Buckets are indexed by fractional coordinate position along each
polyline's ACTUAL coord count (not the padded budget), which is
monotone along the chain — adequate resolution at B=64 for polylines
capped at 256 coords, and resolution-preserving for heavily simplified
chains (a 2-coord straight chain still spans all B buckets).
"""

from __future__ import annotations

import numpy as np


class MatchesManager:
    """Host-side interval raster over all views' polylines.

    `lengths` [V, P] is the actual coord count per polyline (0/1 for
    invalid slots)."""

    def __init__(self, lengths: np.ndarray, buckets: int = 64):
        lengths = np.asarray(lengths)
        self.B = buckets
        self.lengths = lengths
        n_views, n_polylines = lengths.shape
        self.raster = np.zeros((n_views, n_polylines, buckets), dtype=bool)

    def bucket(self, view: np.ndarray, pl: np.ndarray,
               seg: np.ndarray, t: np.ndarray) -> np.ndarray:
        denom = np.maximum(self.lengths[view, pl] - 1, 1)
        pos = (seg + np.clip(t, 0.0, 1.0)) / denom
        return np.clip((pos * self.B).astype(np.int64), 0, self.B - 1)

    def is_matched(self, view: np.ndarray, pl: np.ndarray,
                   seg: np.ndarray, t: np.ndarray) -> np.ndarray:
        b = self.bucket(view, pl, seg, t)
        return self.raster[view, pl, b]

    def mark_points(self, view: np.ndarray, pl: np.ndarray,
                    seg: np.ndarray, t: np.ndarray) -> None:
        b = self.bucket(view, pl, seg, t)
        self.raster[view, pl, b] = True

    def mark_spans(self, view: np.ndarray, pl: np.ndarray,
                   seg_a: np.ndarray, t_a: np.ndarray,
                   seg_b: np.ndarray, t_b: np.ndarray) -> None:
        """Mark whole arcs between two positions (parity:
        add_matched_3dsegment marking the 2D interval,
        plg_matches_manager.cpp:110-173)."""
        ba = self.bucket(view, pl, seg_a, t_a)
        bb = self.bucket(view, pl, seg_b, t_b)
        lo = np.minimum(ba, bb)
        hi = np.maximum(ba, bb)
        # vectorized span fill: outer comparison against bucket axis
        rng = np.arange(self.B)
        span = (rng[None, :] >= lo[:, None]) & (rng[None, :] <= hi[:, None])
        np.logical_or.at(self.raster, (view, pl), span)


    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        """Checkpoint the matched-interval state (parity:
        serialize_plgmm, plg_matches_manager.cpp:182-194)."""
        np.savez_compressed(path, raster=self.raster, lengths=self.lengths)

    @staticmethod
    def load(path: str) -> "MatchesManager":
        z = np.load(path)
        mm = MatchesManager(z["lengths"], buckets=z["raster"].shape[-1])
        mm.raster = z["raster"].astype(bool)
        return mm


def dedup_seed_keys(cams: np.ndarray, pl_id: np.ndarray, seg: np.ndarray,
                    t: np.ndarray, lengths: np.ndarray,
                    buckets: int = 64) -> np.ndarray:
    """Within-batch seed dedup: one seed per (view, polyline, bucket)
    triple of its STARTING view; keeps the first (lowest index).
    `lengths` [V, P] = actual coord counts.

    Returns a boolean keep mask."""
    n_polylines = lengths.shape[1]
    denom = np.maximum(lengths[cams[:, 0], pl_id[:, 0]] - 1, 1)
    pos = (seg[:, 0] + np.clip(t[:, 0], 0, 1)) / denom
    b = np.clip((pos * buckets).astype(np.int64), 0, buckets - 1)
    key = (cams[:, 0].astype(np.int64) * n_polylines
           + pl_id[:, 0]) * buckets + b
    _, first = np.unique(key, return_index=True)
    keep = np.zeros(len(key), dtype=bool)
    keep[first] = True
    return keep
