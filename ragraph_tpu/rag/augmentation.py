"""Library-build graph augmentations.

Parity: ``RAGraph_node/ragraph_utils/Augmentation.py``:
- ``augment_features`` (``:8-20``) — Gaussian feature noise (σ=0.1) then
  node dropout with keep prob ``sample_prob * dropout_rate`` (note: the
  reference's ``dropout_mask`` keeps a node with probability
  ``sample_prob[i] * 0.01`` — i.e. it zeroes almost everything except
  inverse-importance-favored nodes; reproduced verbatim);
- ``augment_adj`` (``:23-29``) — edge rewrite: ``A'[i,j] = 1`` iff
  ``U < (p_i + p_j)/2``;
- ``interpolation_node`` (``:32-48``) — mixup node insertion (unused in the
  reference main path but part of the API);
- ``augment_graph`` (``:51-64``) — yields the original plus
  ``num_augment_scale`` augmented copies.

All functions are pure, PRNG-key-threaded, mask-aware, jit-safe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def augment_features(key: jax.Array, features: jax.Array,
                     sample_prob: jax.Array,
                     noise_std: float = 0.1,
                     dropout_rate: float = 0.01) -> jax.Array:
    """Gaussian noise + inverse-importance node dropout."""
    k_noise, k_drop = jax.random.split(key)
    noisy = features + noise_std * jax.random.normal(k_noise, features.shape)
    keep_prob = jnp.clip(sample_prob * dropout_rate, 0.0, 1.0)
    keep = jax.random.bernoulli(k_drop, keep_prob)
    return noisy * keep[:, None].astype(features.dtype)


def augment_adj(key: jax.Array, adj: jax.Array, sample_prob: jax.Array,
                node_mask: jax.Array | None = None) -> jax.Array:
    """Probabilistic edge rewrite: ``A'[i,j] = 1{U < (p_i + p_j)/2}``."""
    keep_prob = (sample_prob[:, None] + sample_prob[None, :]) * 0.5
    u = jax.random.uniform(key, adj.shape)
    new_adj = (u < keep_prob).astype(adj.dtype)
    if node_mask is not None:
        m = node_mask.astype(adj.dtype)
        new_adj = new_adj * m[:, None] * m[None, :]
    return new_adj


@partial(jax.jit, static_argnames=("interpolation_num",))
def interpolation_node(key: jax.Array, features: jax.Array, adj: jax.Array,
                       interpolation_num: int = 5, alpha: float = 0.5):
    """Mixup node insertion into preallocated extra rows (static shapes)."""
    n, f = features.shape
    new_features = jnp.zeros((n + interpolation_num, f), features.dtype)
    new_features = new_features.at[:n].set(features)
    new_adj = jnp.zeros((n + interpolation_num,) * 2, adj.dtype)
    new_adj = new_adj.at[:n, :n].set(adj)

    pairs = jax.random.randint(key, (interpolation_num, 2), 0, n)

    def body(i, state):
        feats, a = state
        src, dst = pairs[i, 0], pairs[i, 1]
        row = n + i
        feats = feats.at[row].set(alpha * features[src] + (1 - alpha) * features[dst])
        a = a.at[row, src].set(alpha).at[src, row].set(alpha)
        a = a.at[row, dst].set(1 - alpha).at[dst, row].set(1 - alpha)
        return feats, a

    return jax.lax.fori_loop(0, interpolation_num, body,
                             (new_features, new_adj))


def augment_graph(key: jax.Array, num_augment_scale: int,
                  features: jax.Array, adj: jax.Array,
                  sample_prob: jax.Array,
                  node_mask: jax.Array | None = None):
    """Yield ``(features, adj)`` for the original + augmented copies.

    A Python generator over a *static* count — each copy traces into the
    same jitted build step; the PRNG key is split per copy.
    """
    yield features, adj
    for i in range(num_augment_scale):
        k_i = jax.random.fold_in(key, i)
        k_f, k_a = jax.random.split(k_i)
        yield (augment_features(k_f, features, sample_prob),
               augment_adj(k_a, adj, sample_prob, node_mask))
