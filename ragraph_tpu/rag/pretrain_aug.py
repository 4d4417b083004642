"""GraphCL pretraining augmentations (mask / edge / node / subgraph).

Parity target: ``RAGraph_node/aug.py`` —
- ``aug_random_mask`` (``:12-23``): zero a random fraction of node feature
  rows;
- ``aug_random_edge`` (``:25-67``): drop ``percent/2`` of the undirected
  edges and add the same number of random new undirected edges;
- ``aug_drop_node`` (``:69-87``): delete a random node subset;
- ``aug_subgraph`` (``:89-126``): random-walk-grown induced subgraph.

TPU-native redesign: the reference mutates Python edge lists — here every
augmentation is a *masked, shape-preserving* transform on a padded dense
adjacency (deleted nodes become masked-out rows instead of shrinking the
tensor), vectorized and PRNG-keyed; no Python loops over edges.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def aug_random_mask(key: jax.Array, features: jax.Array,
                    drop_percent: float = 0.2,
                    node_mask: jax.Array | None = None) -> jax.Array:
    """Zero a ``drop_percent`` fraction of node feature rows."""
    n = features.shape[0]
    keep = jax.random.uniform(key, (n,)) >= drop_percent
    if node_mask is not None:
        keep = keep | ~node_mask  # padding rows are already zero
    return features * keep[:, None].astype(features.dtype)


def aug_random_edge(key: jax.Array, adj: jax.Array,
                    drop_percent: float = 0.2,
                    node_mask: jax.Array | None = None) -> jax.Array:
    """Drop and add ``percent/2 / 2`` of the undirected edges.

    Matches the reference rates (``aug.py:27-40``): with E undirected
    edges, ``E · drop_percent/4`` are dropped and as many random new pairs
    added; both symmetric.
    """
    n = adj.shape[0]
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    k_drop, k_add = jax.random.split(key)
    pair_valid = node_mask[:, None] & node_mask[None, :]
    upper = jnp.triu(jnp.ones((n, n), bool), 1) & pair_valid

    rate = drop_percent / 4.0
    drop = (jax.random.uniform(k_drop, (n, n)) < rate) & (adj > 0) & upper
    # add the *expected* same count of new edges among non-edges
    num_edges = jnp.sum((adj > 0) & upper)
    num_pairs = jnp.maximum(jnp.sum(upper), 1)
    add_rate = rate * num_edges / num_pairs
    add = (jax.random.uniform(k_add, (n, n)) < add_rate) \
        & (adj == 0) & upper

    new_upper = jnp.where(drop, 0.0, jnp.where(add, 1.0,
                                               jnp.triu(adj, 1)))
    return new_upper + new_upper.T


def aug_drop_node(key: jax.Array, features: jax.Array, adj: jax.Array,
                  drop_percent: float = 0.2,
                  node_mask: jax.Array | None = None):
    """Delete a random node fraction (as masking, not reshaping).

    Returns ``(features, adj, new_node_mask)`` — downstream mask-aware ops
    treat masked nodes exactly like the reference's deleted rows.
    """
    n = features.shape[0]
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    keep = jax.random.uniform(key, (n,)) >= drop_percent
    new_mask = node_mask & keep
    f = features * new_mask[:, None].astype(features.dtype)
    m = new_mask.astype(adj.dtype)
    return f, adj * m[:, None] * m[None, :], new_mask


@partial(jax.jit, static_argnames=("max_steps",))
def aug_subgraph(key: jax.Array, features: jax.Array, adj: jax.Array,
                 drop_percent: float = 0.2,
                 node_mask: jax.Array | None = None,
                 max_steps: int | None = None):
    """Random-walk-grown induced subgraph (as masking).

    Grows a frontier from a random center: each step adds one uniformly
    random unvisited neighbor of the current subgraph (``aug.py:96-113``),
    until ``(1 - drop_percent)·N`` nodes or no frontier. Implemented as a
    ``fori_loop`` over a boolean membership vector — static shapes.
    """
    n = features.shape[0]
    if node_mask is None:
        node_mask = jnp.ones((n,), dtype=bool)
    maskf = node_mask.astype(jnp.float32)
    n_real = jnp.maximum(maskf.sum(), 1.0)
    target = jnp.floor(n_real * (1.0 - drop_percent)).astype(jnp.int32)
    steps = max_steps if max_steps is not None else n

    k_center, k_loop = jax.random.split(key)
    probs = maskf / n_real
    center = jax.random.choice(k_center, n, p=probs)
    member = jnp.zeros((n,), bool).at[center].set(True)

    neighbor = (adj > 0) & (node_mask[:, None] & node_mask[None, :])

    def body(i, member):
        frontier = (neighbor & member[:, None]).any(axis=0) & ~member
        has_frontier = frontier.any()
        under_target = member.sum() < target
        gumbel = jax.random.gumbel(jax.random.fold_in(k_loop, i), (n,))
        pick = jnp.argmax(jnp.where(frontier, gumbel, -jnp.inf))
        add = has_frontier & under_target
        return member.at[pick].set(member[pick] | add)

    member = jax.lax.fori_loop(0, steps, body, member)
    f = features * member[:, None].astype(features.dtype)
    m = member.astype(adj.dtype)
    return f, adj * m[:, None] * m[None, :], member


def make_graphcl_views(key: jax.Array, flavor: str, features: jax.Array,
                       adj: jax.Array, node_mask: jax.Array | None = None,
                       drop_percent: float = 0.2, normalize: bool = True):
    """Two augmented (features, adj, mask) views for a GraphCL flavor.

    Input wiring matches ``GraphCL.forward``
    (``RAGraph_node/models/graphcl.py:21-41``):

    - ``edge``:     clean features, two edge-rewritten adjacencies;
    - ``mask``:     two feature-masked views, clean adjacency;
    - ``node``:     two node-dropped views (features *and* adjacency);
    - ``subgraph``: two random-walk induced subgraphs.

    ``normalize=True`` re-normalizes any adjacency the augmentation
    changed (the reference normalizes augmented adjacencies before the
    GCN, ``pretrain.py:108-112``).
    """
    from ragraph_tpu.core.graph import normalize_adj_dense

    k1, k2 = jax.random.split(key)
    norm = (lambda a, m: normalize_adj_dense(a, m, add_self_loops=True)) \
        if normalize else (lambda a, m: a)

    if flavor == "edge":
        a1 = norm(aug_random_edge(k1, adj, drop_percent, node_mask),
                  node_mask)
        a2 = norm(aug_random_edge(k2, adj, drop_percent, node_mask),
                  node_mask)
        return (features, a1, node_mask), (features, a2, node_mask)
    if flavor == "mask":
        f1 = aug_random_mask(k1, features, drop_percent, node_mask)
        f2 = aug_random_mask(k2, features, drop_percent, node_mask)
        a = norm(adj, node_mask)
        return (f1, a, node_mask), (f2, a, node_mask)
    if flavor == "node":
        f1, a1, m1 = aug_drop_node(k1, features, adj, drop_percent,
                                   node_mask)
        f2, a2, m2 = aug_drop_node(k2, features, adj, drop_percent,
                                   node_mask)
        return (f1, norm(a1, m1), m1), (f2, norm(a2, m2), m2)
    if flavor == "subgraph":
        f1, a1, m1 = aug_subgraph(k1, features, adj, drop_percent,
                                  node_mask)
        f2, a2, m2 = aug_subgraph(k2, features, adj, drop_percent,
                                  node_mask)
        return (f1, norm(a1, m1), m1), (f2, norm(a2, m2), m2)
    raise ValueError(f"unknown GraphCL flavor: {flavor!r}")
