"""Device-side community detection: weighted label propagation.

TPU-native replacement for the reference's grappolo (PNNL parallel
Louvain) invoked through a DIMACS file round-trip (reference:
external/grappolo-05-2014/driverForGraphClustering_edited.cpp:50-170,
src/edgegraph3d/matching/polyline_matching/community_detection_interface.cpp:42-73,
src/edgegraph3d/plgs/graph_adjacency_set_undirected_no_type_weighted.cpp:38-74).
BASELINE.json names label propagation as the designated device-side
replacement; community quality only affects stage-1 recall (SURVEY.md
"Grappolo replacement quality"), so exact Louvain parity is not
required — grappolo is thread-nondeterministic anyway.

Algorithm: synchronous weighted label propagation over an edge list,
`n_iters` rounds, ties broken toward the smaller label (deterministic).
Runs jitted on device: each round is one segment-sum + argmax.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_nodes", "n_iters"))
def label_propagation(edges: jnp.ndarray, weights: jnp.ndarray,
                      n_nodes: int, n_iters: int = 30) -> jnp.ndarray:
    """edges [E,2] int32 (undirected), weights [E] -> labels [n_nodes].

    Invalid edges are marked with node id -1 and ignored.

    Sparse formulation: per round, directed-edge contributions are
    grouped by (receiver, sender-label) with a sort + segment-sum, then
    reduced per receiver with scatter-max (score) and scatter-min
    (tie-break toward the smaller label).  O(E log E) per round — no
    dense [n, n] scoreboard.
    """
    # the (src, label) sort key below is src*(n_nodes+1)+label; int32 is
    # exact for all realistic graph sizes (polyline-node counts are in
    # the thousands) — int64 would silently truncate to int32 on TPU
    # anyway (x64 disabled) and warn every run
    if (n_nodes + 1) * (n_nodes + 1) >= 2 ** 31:
        raise ValueError(f"label_propagation: n_nodes={n_nodes} too "
                         "large for the int32 (src, label) sort key")
    valid = (edges[:, 0] >= 0) & (edges[:, 1] >= 0)
    w = jnp.where(valid, weights, 0.0)
    src = jnp.concatenate([edges[:, 0], edges[:, 1]])
    dst = jnp.concatenate([edges[:, 1], edges[:, 0]])
    ww = jnp.concatenate([w, w]).astype(jnp.float32)
    src = jnp.maximum(src, 0)
    dst = jnp.maximum(dst, 0)
    E2 = src.shape[0]
    NEG = jnp.float32(-1.0)

    def step(labels, _):
        lab_v = labels[dst]
        key = src.astype(jnp.int32) * jnp.int32(n_nodes + 1) + lab_v
        order = jnp.argsort(key)
        ks = key[order]
        ws = ww[order]
        start = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        gid = jnp.cumsum(start) - 1                       # group index
        gsum = jax.ops.segment_sum(ws, gid, num_segments=E2)
        # representative (src, label) per group, read at group starts
        g_src = jnp.where(start, (ks // (n_nodes + 1)).astype(jnp.int32), 0)
        g_lab = jnp.where(start, (ks % (n_nodes + 1)).astype(jnp.int32), 0)
        g_score = gsum[gid] * start                       # score at starts
        # best score per receiver
        best = jnp.full((n_nodes,), NEG).at[g_src].max(
            jnp.where(start, g_score, NEG))
        # among groups hitting the best score: smallest label
        is_best = start & (g_score >= best[g_src] - 1e-12) & (g_score > 0)
        new = jnp.full((n_nodes,), n_nodes, jnp.int32).at[
            jnp.where(is_best, g_src, n_nodes - 1)].min(
            jnp.where(is_best, g_lab, n_nodes))
        has = best > 0
        return jnp.where(has & (new < n_nodes), new, labels), None

    labels0 = jnp.arange(n_nodes, dtype=jnp.int32)
    labels, _ = jax.lax.scan(step, labels0, None, length=n_iters)
    return labels


def communities_from_edges(edges: np.ndarray, weights: np.ndarray,
                           n_nodes: int, n_iters: int = 30,
                           min_size: int = 2) -> list[np.ndarray]:
    """Edge list -> list of node-id arrays (communities of >= min_size).

    Mirrors the reference call contract (compute_communities,
    community_detection_interface.cpp:57-73: cluster id per node)."""
    if len(edges) == 0 or n_nodes == 0:
        return []
    # pad shapes to powers of two so compiled executables are reused
    # across scenes (and across the persistent compile cache)
    E_pad = 1 << int(np.ceil(np.log2(max(len(edges), 1))))
    n_pad = 1 << int(np.ceil(np.log2(max(n_nodes, 1))))
    edges_p = np.full((E_pad, 2), -1, dtype=np.int32)
    edges_p[: len(edges)] = edges
    weights_p = np.zeros(E_pad, dtype=np.float32)
    weights_p[: len(weights)] = weights
    labels = np.asarray(label_propagation(
        jnp.asarray(edges_p), jnp.asarray(weights_p),
        n_pad, n_iters))[:n_nodes]
    out = []
    for lab in np.unique(labels):
        members = np.flatnonzero(labels == lab)
        if len(members) >= min_size:
            out.append(members)
    return out
