"""Shortest-path distances and position-aware structural codes.

The reference computes *all-pairs* shortest paths with an O(N³) Python-loop
Floyd–Warshall (``RAGraph_node/ragraph_utils/PositionAwareEncoder.py:27-47``)
and then keeps only distances to ``num_anchors`` random anchors, clipped at
``dis_q`` (``:6-24``). Two TPU-native replacements:

- :func:`all_pairs_shortest_paths` — repeated min-plus *squaring*
  (``log2(N)`` blocked min-plus products instead of ``N`` sequential
  relaxations); used for parity testing and small graphs.
- :func:`anchor_distances` — multi-source Bellman–Ford from the anchors
  only: ``dis_q`` rounds of a masked min-plus mat-vec, O(dis_q · N² · A)
  with A ≪ N. Since the position code zeroes any distance ≥ ``dis_q``,
  ``dis_q`` relaxation rounds are *exact* for the downstream code. This is
  the production path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

INF = jnp.float32(1e9)


def _init_dist(adj: jax.Array, node_mask: jax.Array | None) -> jax.Array:
    """Edge-weight matrix: adj>0 -> weight, diag -> 0, else INF (masked)."""
    n = adj.shape[0]
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    pair_mask = node_mask[:, None] & node_mask[None, :]
    dist = jnp.where((adj > 0) & pair_mask, adj, INF)
    eye = jnp.eye(n, dtype=bool)
    return jnp.where(eye & pair_mask, 0.0, dist)


def _minplus(a: jax.Array, b: jax.Array, block: int = 16) -> jax.Array:
    """Blocked min-plus product ``C[i,j] = min_k A[i,k] + B[k,j]``.

    Scans over row blocks so the 3-D broadcast intermediate stays
    ``(block, N, N)`` — VMEM-friendly instead of O(N³) HBM.
    """
    n = a.shape[0]
    pad = (-n) % block
    a_p = jnp.pad(a, ((0, pad), (0, 0)), constant_values=INF)
    blocks = a_p.reshape(-1, block, n)

    def one_block(a_blk):
        # (block, N, 1) + (1, N, N) -> min over middle axis -> (block, N)
        return jnp.min(a_blk[:, :, None] + b[None, :, :], axis=1)

    out = jax.lax.map(one_block, blocks)
    return out.reshape(-1, n)[:n]


@partial(jax.jit, static_argnames=("block",))
def all_pairs_shortest_paths(adj: jax.Array,
                             node_mask: jax.Array | None = None,
                             block: int = 16) -> jax.Array:
    """APSP by min-plus squaring: ``ceil(log2(N))`` doubling steps."""
    dist = _init_dist(adj, node_mask)
    n = adj.shape[0]
    steps = max(1, (n - 1).bit_length())
    for _ in range(steps):
        dist = jnp.minimum(dist, _minplus(dist, dist, block=block))
    return dist


@partial(jax.jit, static_argnames=("num_hops",))
def anchor_distances(adj: jax.Array, anchor_idx: jax.Array,
                     node_mask: jax.Array | None = None,
                     num_hops: int = 10) -> jax.Array:
    """Unweighted shortest distance from every node to each anchor.

    ``num_hops`` rounds of Bellman–Ford relaxation: distances larger than
    ``num_hops`` remain INF, which is exactly what the ``dis_q`` clipping in
    the position code needs.

    Returns ``(N, A)`` float distances (INF where unreachable in
    ``num_hops`` hops).
    """
    n = adj.shape[0]
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    neighbor = (adj > 0) & (node_mask[:, None] & node_mask[None, :])
    neighborf = neighbor.astype(jnp.float32)  # (N, N)

    a = anchor_idx.shape[0]
    dist = jnp.full((n, a), INF)
    dist = dist.at[anchor_idx, jnp.arange(a)].set(0.0)

    def body(_, dist):
        # best reachable-via-one-edge distance: min over u adjacent to v of
        # dist[u] + 1. Implemented as masked min: where no edge -> INF.
        via = jnp.min(
            jnp.where(neighborf[:, :, None] > 0, dist[None, :, :], INF),
            axis=1,
        ) + 1.0
        return jnp.minimum(dist, via)

    dist = jax.lax.fori_loop(0, num_hops, body, dist)
    return jnp.where(node_mask[:, None], dist, INF)


@partial(jax.jit, static_argnames=("num_anchors", "dis_q"))
def position_aware_codes(adj: jax.Array, key: jax.Array,
                         node_mask: jax.Array | None = None,
                         num_anchors: int = 10, dis_q: int = 10) -> jax.Array:
    """Position-aware structural code: ``1/(d+1)`` to random anchors.

    Parity with ``PositionAwareEncoder.encode_position_aware_code``
    (``RAGraph_node/ragraph_utils/PositionAwareEncoder.py:6-24``): anchors
    drawn uniformly with replacement; code is ``1/(dist+1)`` when
    ``dist < dis_q`` else 0. Anchors are restricted to real (unmasked)
    nodes.
    """
    n = adj.shape[0]
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    probs = node_mask.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    anchor_idx = jax.random.choice(key, n, shape=(num_anchors,), p=probs)
    dist = anchor_distances(adj, anchor_idx, node_mask, num_hops=dis_q)
    code = jnp.where(dist < dis_q, 1.0 / (dist + 1.0), 0.0)
    return code * node_mask[:, None]
