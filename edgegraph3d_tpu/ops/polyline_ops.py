"""Polyline walk primitives as vectorized masked-array ops.

TPU-native replacement for the reference's sequential per-segment walks
(reference: src/edgegraph3d/plgs/polyline_graph_2d.cpp:560-790 —
next_pl_point_by_distance, next_pl_point_by_line_intersection[_bounded_
distance], split_equal_size_intervals; and the segment/line intersection
primitive src/edgegraph3d/utils/geometry/geometric_utilities.cpp:272-430).

A position on a polyline is (seg_idx, t, xy): point = lerp(coords[seg],
coords[seg+1], t).  Direction is +1 (towards the end) or -1 (towards the
start).  Every function below is written for ONE polyline [L,2] with a
valid-count and is vmapped by callers over seeds/views; "first event
along the walk" scans become masked argmin reductions over the L axis.

Matches the reference's event semantics: the first segment in walk order
carrying a quasi-parallel line or an intersection decides the outcome;
bounded-distance violation is checked on that first intersection only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = 1e30


class PLPoint(NamedTuple):
    seg: jnp.ndarray      # int32 segment index
    t: jnp.ndarray        # float in [0,1] within segment
    xy: jnp.ndarray       # [2] coordinates


def plp_coords(coords: jnp.ndarray, seg: jnp.ndarray,
               t: jnp.ndarray) -> jnp.ndarray:
    a = coords[seg]
    b = coords[jnp.minimum(seg + 1, coords.shape[0] - 1)]
    return a + t[..., None] * (b - a)


# ----------------------------------------------------------------------
# Closest point on a polyline
# ----------------------------------------------------------------------

def closest_point_on_polyline(coords: jnp.ndarray, length: jnp.ndarray,
                              pt: jnp.ndarray):
    """(dist, PLPoint) of the closest point on the polyline to `pt`.

    coords [L,2], length scalar int, pt [2].  Invalid slots -> +inf.
    """
    L = coords.shape[0]
    a = coords[:-1]
    b = coords[1:]
    seg_valid = jnp.arange(L - 1) < (length - 1)
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)
    t = jnp.clip(jnp.sum((pt - a) * ab, axis=-1) / denom, 0.0, 1.0)
    proj = a + t[:, None] * ab
    d2 = jnp.sum((pt - proj) ** 2, axis=-1)
    d2 = jnp.where(seg_valid, d2, BIG)
    k = jnp.argmin(d2)
    dist = jnp.sqrt(d2[k])
    return dist, PLPoint(seg=k.astype(jnp.int32), t=t[k], xy=proj[k])


# ----------------------------------------------------------------------
# Advance by euclidean radius
# ----------------------------------------------------------------------

class AdvanceResult(NamedTuple):
    plp: PLPoint
    reached_extreme: jnp.ndarray   # bool
    found: jnp.ndarray             # bool


def advance_by_distance(coords: jnp.ndarray, length: jnp.ndarray,
                        plp: PLPoint, direction: jnp.ndarray,
                        radius: float) -> AdvanceResult:
    """Next point along the walk at euclidean distance `radius` from the
    current point (parity: next_pl_point_by_distance — the first circle
    crossing in walk order; reaching the extreme first -> flag)."""
    L = coords.shape[0]
    c = plp.xy
    d = jnp.linalg.norm(coords - c[None, :], axis=-1)          # [L]
    idx = jnp.arange(L - 1)

    fwd = direction > 0
    # segment k spans coords[k] -> coords[k+1]; in walk order the "far"
    # endpoint is k+1 (fwd) or k (bwd)
    far_d = jnp.where(fwd, d[1:], d[:-1])
    ahead = jnp.where(fwd, idx >= plp.seg, idx <= plp.seg)
    seg_valid = idx < (length - 1)
    hit = ahead & seg_valid & (far_d >= radius)
    any_hit = jnp.any(hit)
    # first hit in walk order
    walk_pos = jnp.where(fwd, idx, -idx)
    k = jnp.argmin(jnp.where(hit, walk_pos, BIG))
    k = k.astype(jnp.int32)

    a = coords[k]
    b = coords[k + 1]
    u = b - a
    A = jnp.maximum(jnp.sum(u * u), 1e-12)
    B = 2.0 * jnp.sum(u * (a - c))
    C = jnp.sum((a - c) ** 2) - radius * radius
    disc = jnp.maximum(B * B - 4 * A * C, 0.0)
    sq = jnp.sqrt(disc)
    # forward root in walk direction: larger s for fwd, smaller for bwd
    s = jnp.where(fwd, (-B + sq) / (2 * A), (-B - sq) / (2 * A))
    s = jnp.clip(s, 0.0, 1.0)
    xy = a + s * u
    new = PLPoint(seg=k, t=s, xy=xy)
    return AdvanceResult(plp=new, reached_extreme=~any_hit, found=any_hit)


# ----------------------------------------------------------------------
# Segment x line intersection (batched over segments)
# ----------------------------------------------------------------------

def _segments_line_intersection(a, b, line, quasi_cos, quasi_dist):
    """For segments a->b [K,2] and a normalized line [3], return
    (has_int [K], s [K], quasi [K]) (parity:
    intersect_segment_line_no_quasiparallel, geometric_utilities.cpp:272-430)."""
    sa = a[:, 0] * line[0] + a[:, 1] * line[1] + line[2]
    sb = b[:, 0] * line[0] + b[:, 1] * line[1] + line[2]
    diff = sa - sb
    crosses = (sa * sb) <= 0.0
    parallel = jnp.abs(diff) < 1e-9
    s = jnp.where(parallel, 0.0, sa / jnp.where(parallel, 1.0, diff))
    u = b - a
    ulen = jnp.maximum(jnp.linalg.norm(u, axis=-1), 1e-12)
    # line direction is (-line[1], line[0]); cos of angle to segment
    cos = jnp.abs(-u[:, 0] * line[1] + u[:, 1] * line[0]) / ulen
    near = jnp.minimum(jnp.abs(sa), jnp.abs(sb)) <= quasi_dist
    quasi = (cos > quasi_cos) & near
    has = crosses & ~parallel & ~quasi
    return has, s, quasi


class IntersectResult(NamedTuple):
    plp: PLPoint
    found: jnp.ndarray
    reached_extreme: jnp.ndarray
    quasiparallel: jnp.ndarray
    bounded_violation: jnp.ndarray


def next_intersection_bounded(coords: jnp.ndarray, length: jnp.ndarray,
                              plp: PLPoint, direction: jnp.ndarray,
                              line: jnp.ndarray,
                              min_dist: float, max_dist: float,
                              quasi_cos: float = 0.965,
                              quasi_dist: float = 5.0) -> IntersectResult:
    """First intersection of the walk with an epipolar line; euclidean
    distance from the current point must land in [min_dist, max_dist]
    (parity: next_pl_point_by_line_intersection_bounded_distance,
    polyline_graph_2d.cpp:666-790).  Pass max_dist=inf for the unbounded
    variant (:579-664)."""
    L = coords.shape[0]
    idx = jnp.arange(L - 1)
    a = coords[:-1]
    b = coords[1:]
    has, s, quasi = _segments_line_intersection(a, b, line, quasi_cos,
                                                quasi_dist)
    fwd = direction > 0
    seg_valid = idx < (length - 1)
    ahead = jnp.where(fwd, idx >= plp.seg, idx <= plp.seg)
    # the current segment participates only partially: s beyond t
    on_cur = idx == plp.seg
    s_ok = jnp.where(on_cur, jnp.where(fwd, s >= plp.t, s <= plp.t), True)

    event_i = has & ahead & seg_valid & s_ok
    event_q = quasi & ahead & seg_valid
    event = event_i | event_q
    walk_pos = jnp.where(fwd, idx, -idx)
    first = jnp.argmin(jnp.where(event, walk_pos, BIG)).astype(jnp.int32)
    any_event = jnp.any(event)
    is_quasi = event_q[first] & any_event

    xy = a[first] + s[first] * (b[first] - a[first])
    dsq = jnp.sum((xy - plp.xy) ** 2)
    in_bounds = (dsq >= min_dist * min_dist) & (dsq <= max_dist * max_dist)
    found = any_event & ~is_quasi & in_bounds
    violated = any_event & ~is_quasi & ~in_bounds
    return IntersectResult(
        plp=PLPoint(seg=first, t=s[first], xy=xy),
        found=found,
        reached_extreme=~any_event,
        quasiparallel=is_quasi,
        bounded_violation=violated,
    )


def polyline_line_intersections(coords: jnp.ndarray, length: jnp.ndarray,
                                line: jnp.ndarray, max_out: int,
                                quasi_cos: float = 0.965,
                                quasi_dist: float = 5.0):
    """All intersections of a polyline with a line, up to `max_out`
    (used by the edge manager's epipolar correspondence detection,
    parity: SegmentEdgeManager-style epipolar intersection collection,
    plg_edge_manager.cpp:208-259).

    Returns (xy [max_out,2], seg [max_out], t [max_out], valid [max_out]).
    """
    L = coords.shape[0]
    idx = jnp.arange(L - 1)
    a = coords[:-1]
    b = coords[1:]
    has, s, _ = _segments_line_intersection(a, b, line, quasi_cos,
                                            quasi_dist)
    seg_valid = idx < (length - 1)
    ok = has & seg_valid
    xy = a + s[:, None] * (b - a)
    # stable-compact the first max_out hits
    order = jnp.argsort(jnp.where(ok, idx, L * 2))[:max_out]
    valid = ok[order]
    return xy[order], order.astype(jnp.int32), s[order], valid


# ----------------------------------------------------------------------
# Interval sampling
# ----------------------------------------------------------------------

def sample_interval_points(coords: jnp.ndarray, length: jnp.ndarray,
                           spacing: float, max_samples: int):
    """Points along the polyline at euclidean `spacing` from each other,
    starting at the first coord (parity: split_equal_size_intervals,
    polyline_graph_2d.cpp:568-577 — repeated next_pl_point_by_distance).

    Returns (xy [max_samples,2], seg [max_samples], t [max_samples],
    valid [max_samples]).  Implemented as a bounded scan of
    advance_by_distance.
    """
    def step(carry, _):
        plp, alive = carry
        res = advance_by_distance(coords, length, plp, jnp.int32(1), spacing)
        alive_new = alive & res.found
        plp_new = PLPoint(
            seg=jnp.where(alive_new, res.plp.seg, plp.seg),
            t=jnp.where(alive_new, res.plp.t, plp.t),
            xy=jnp.where(alive_new, res.plp.xy, plp.xy))
        return (plp_new, alive_new), (plp_new, alive_new)

    first = PLPoint(seg=jnp.int32(0), t=jnp.float32(0.0), xy=coords[0])
    (_, _), (plps, alive) = jax.lax.scan(
        step, (first, length >= 2), None, length=max_samples - 1)
    xy = jnp.concatenate([first.xy[None], plps.xy], axis=0)
    seg = jnp.concatenate([first.seg[None], plps.seg], axis=0)
    t = jnp.concatenate([first.t[None], plps.t], axis=0)
    valid = jnp.concatenate([(length >= 2)[None], alive], axis=0)
    return xy, seg, t, valid
