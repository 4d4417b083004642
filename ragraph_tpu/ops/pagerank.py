"""PageRank, degree centrality, and inverse-importance sampling probabilities.

Reference semantics:

- dense PageRank power iteration with L1-norm convergence and dangling-node
  (zero out-degree) uniform teleport —
  ``RAGraph_node/ragraph_utils/InverseSampling.py:22-48``;
- sparse COO variant with dangling correction —
  ``RAGraph_edge/modules/ragraph_utils/InverseSampling.py:6-69``;
- degree centrality ``deg / (N - 1)`` —
  ``RAGraph_node/ragraph_utils/InverseSampling.py:50-56``;
- sampling prob ∝ ``1 / (0.5 PR + 0.5 DC + eps)`` normalized —
  ``RAGraph_node/ragraph_utils/InverseSampling.py:6-20``.

TPU design: the unbounded ``while True`` of the reference becomes a
``lax.while_loop`` with a convergence predicate *and* a hard iteration cap
(static shapes, guaranteed termination under jit). Mask-awareness is added
throughout so padded nodes receive zero probability.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_iters",))
def pagerank_dense(adj: jax.Array, node_mask: jax.Array | None = None,
                   damping: float = 0.85, eps: float = 1e-6,
                   max_iters: int = 200) -> jax.Array:
    """Power-iteration PageRank on a dense (padded) adjacency.

    Matches the reference update ``p' = (1-d)/N + d * P^T p`` with dangling
    rows replaced by the uniform distribution; iterates until
    ``||p' - p||_1 < eps`` or ``max_iters``.
    """
    n_pad = adj.shape[0]
    if node_mask is None:
        node_mask = jnp.ones((n_pad,), dtype=bool)
    maskf = node_mask.astype(adj.dtype)
    n_real = jnp.maximum(maskf.sum(), 1.0)

    adj = adj * maskf[:, None] * maskf[None, :]
    out_degree = adj.sum(axis=1)
    dangling = (out_degree == 0) & node_mask
    # Row-normalized transition matrix; dangling real rows -> uniform 1/N
    # over real nodes (reference sets the whole row to 1/N at
    # InverseSampling.py:33, with N the padded==real count there).
    # Divide by the ACTUAL positive degree — the callers pass binorm-
    # weighted adjacencies whose row sums can be in (0, 1); clamping to 1
    # would leak probability mass on those rows (reference divides by the
    # raw out_degree and only patches zero rows).
    p_mat = adj / jnp.where(out_degree > 0, out_degree, 1.0)[:, None]
    p_mat = jnp.where(dangling[:, None], maskf[None, :] / n_real, p_mat)

    p0 = maskf / n_real

    def cond(state):
        _, delta, it = state
        return (delta >= eps) & (it < max_iters)

    def body(state):
        p, _, it = state
        new_p = (1.0 - damping) / n_real + damping * (p_mat.T @ p)
        new_p = new_p * maskf
        return new_p, jnp.abs(new_p - p).sum(), it + 1

    p, _, _ = jax.lax.while_loop(cond, body, (p0, jnp.inf, 0))
    return p


def degree_centrality_dense(adj: jax.Array,
                            node_mask: jax.Array | None = None) -> jax.Array:
    """``deg / (N_real - 1)`` column-sum degree centrality (mask-aware)."""
    if node_mask is None:
        node_mask = jnp.ones((adj.shape[0],), dtype=bool)
    maskf = node_mask.astype(adj.dtype)
    adj = adj * maskf[:, None] * maskf[None, :]
    degree = adj.sum(axis=0)
    n_real = jnp.maximum(maskf.sum(), 2.0)
    return degree / (n_real - 1.0)


@partial(jax.jit, static_argnames=("max_iters",))
def inverse_sample_prob_dense(adj: jax.Array,
                              node_mask: jax.Array | None = None,
                              alpha: float = 0.5, eps: float = 1e-6,
                              max_iters: int = 200) -> jax.Array:
    """Sampling prob ∝ ``1/(alpha·PR + (1-alpha)·DC + eps)``, masked+normalized."""
    if node_mask is None:
        node_mask = jnp.ones((adj.shape[0],), dtype=bool)
    pr = pagerank_dense(adj, node_mask, max_iters=max_iters)
    dc = degree_centrality_dense(adj, node_mask)
    importance = alpha * pr + (1.0 - alpha) * dc
    inv = jnp.where(node_mask, 1.0 / (importance + eps), 0.0)
    return inv / jnp.maximum(inv.sum(), 1e-12)


@partial(jax.jit, static_argnames=("num_nodes", "max_iters"))
def pagerank_edges(senders: jax.Array, receivers: jax.Array,
                   edge_weights: jax.Array, num_nodes: int,
                   damping: float = 0.85, eps: float = 1e-6,
                   max_iters: int = 200) -> jax.Array:
    """Sparse PageRank over a (possibly weighted) edge list.

    Mirrors the edge-package COO variant
    (``RAGraph_edge/modules/ragraph_utils/InverseSampling.py:22-60``) which
    runs on the *binorm-weighted* adjacency values: dangling mass is
    redistributed uniformly via a scalar correction rather than
    materializing uniform rows. Pass a bool mask for a binary graph.
    """
    w = edge_weights.astype(jnp.float32)
    out_degree = jax.ops.segment_sum(w, senders, num_segments=num_nodes)
    # 1/actual degree, not 1/max(degree, 1): binorm edge weights give
    # fractional out-degrees and the reference divides by the raw sum
    inv_out = jnp.where(out_degree > 0,
                        1.0 / jnp.where(out_degree > 0, out_degree, 1.0),
                        0.0)
    dangling = out_degree == 0
    n = jnp.asarray(num_nodes, jnp.float32)
    p0 = jnp.full((num_nodes,), 1.0 / n)

    def cond(state):
        _, delta, it = state
        return (delta >= eps) & (it < max_iters)

    def body(state):
        p, _, it = state
        contrib = (p * inv_out)[senders] * w
        spread = jax.ops.segment_sum(contrib, receivers, num_segments=num_nodes)
        dangling_mass = jnp.sum(jnp.where(dangling, p, 0.0)) / n
        new_p = (1.0 - damping) / n + damping * (spread + dangling_mass)
        return new_p, jnp.abs(new_p - p).sum(), it + 1

    p, _, _ = jax.lax.while_loop(cond, body, (p0, jnp.inf, 0))
    return p


@partial(jax.jit, static_argnames=("num_nodes", "max_iters"))
def inverse_sample_prob_edges(senders: jax.Array, receivers: jax.Array,
                              edge_weights: jax.Array, num_nodes: int,
                              alpha: float = 0.5, eps: float = 1e-6,
                              max_iters: int = 200) -> jax.Array:
    """Edge-list counterpart of :func:`inverse_sample_prob_dense`."""
    pr = pagerank_edges(senders, receivers, edge_weights, num_nodes,
                        max_iters=max_iters)
    w = edge_weights.astype(jnp.float32)
    degree = jax.ops.segment_sum(w, receivers, num_segments=num_nodes)
    dc = degree / jnp.maximum(jnp.asarray(num_nodes, jnp.float32) - 1.0, 1.0)
    importance = alpha * pr + (1.0 - alpha) * dc
    inv = 1.0 / (importance + eps)
    return inv / jnp.maximum(inv.sum(), 1e-12)
