"""Legacy GraphPrompt-style downstream prompt heads (downprompt family).

Parity targets:
- ``downstreamprompt`` — learnable elementwise ``(1, H)`` prompt (+ELU)
  (``RAGraph_node/downprompt.py:117-129``);
- ``weighted_prompt`` — 3-way pretrain-prompt mixer, init (0.9, 0.9, 0.1)
  (``:81-96``);
- ``weighted_feature`` — 2-way feature mixer, init (1, 0) (``:100-113``);
- ``averageemb`` — per-class mean embeddings (``:59-78`` hardcodes 3
  classes; ``RAGraph_graph/downprompt.py:59-94`` up to 7) — here a
  segment-mean over any C;
- ``downprompt`` — prompt-scaled embeddings classified by cosine to class
  centroids + softmax (``RAGraph_node/downprompt.py:26-47``);
- graph helpers: ``split_and_batchify_graph_feats`` sum-pool
  (``RAGraph_graph/downprompt.py:95-110``), ``distance2center`` squared
  euclidean (``:172-181``), ``onehot`` (``:185-189``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn

from ragraph_tpu.nn.layers import xavier_uniform
from ragraph_tpu.ops.similarity import l2_normalize


def average_emb(embeddings: jax.Array, labels: jax.Array,
                num_classes: int,
                mask: jax.Array | None = None) -> jax.Array:
    """Per-class mean embedding ``(C, H)`` (vectorized ``averageemb``)."""
    if mask is not None:
        w = mask.astype(embeddings.dtype)
    else:
        w = jnp.ones((embeddings.shape[0],), embeddings.dtype)
    sums = jax.ops.segment_sum(embeddings * w[:, None], labels,
                               num_segments=num_classes)
    counts = jax.ops.segment_sum(w, labels, num_segments=num_classes)
    return sums / jnp.maximum(counts, 1.0)[:, None]


class DownstreamPrompt(fnn.Module):
    """Elementwise prompt: ``act(weight * x)``."""

    hidden: int
    use_act: bool = True  # node variant applies ELU; graph variant doesn't

    @fnn.compact
    def __call__(self, x):
        w = self.param("weight", xavier_uniform, (1, self.hidden))
        out = w * x
        return jax.nn.elu(out) if self.use_act else out


class WeightedPrompt(fnn.Module):
    """``(1, n) @ (n, H)`` prompt mixer with the reference's fixed init."""

    num_prompts: int = 3

    @fnn.compact
    def __call__(self, prompts):
        def init(_key):
            base = jnp.full((1, self.num_prompts), 0.9)
            if self.num_prompts >= 3:
                base = base.at[0, 2].set(0.1)
            return base
        w = self.param("weight", init)
        return w @ prompts


class WeightedFeature(fnn.Module):
    """``act(w0 * a + w1 * b)`` with init (1, 0)."""

    @fnn.compact
    def __call__(self, a, b):
        w = self.param("weight",
                       lambda _k: jnp.asarray([[1.0, 0.0]], jnp.float32))
        return jax.nn.elu(w[0, 0] * a + w[0, 1] * b)


class DownPrompt(fnn.Module):
    """Downstream head: prompt embeddings → cosine to class centroids →
    softmax probabilities.

    ``__call__(seq, centroids)``; recompute centroids with
    :func:`average_emb` over the (prompted) support embeddings when
    ``train=1`` in the reference protocol.
    """

    hidden: int
    num_classes: int = 3

    def setup(self):
        self.down = DownstreamPrompt(self.hidden)
        # The reference's downprompt also constructs weighted_prompt /
        # weighted_feature members but never calls them in forward
        # (``RAGraph_node/downprompt.py:16-18``); flax only materializes
        # params for invoked submodules, so mirroring the dead members
        # here would create nothing — the standalone WeightedPrompt /
        # WeightedFeature modules above cover the classes themselves.

    def prompt_features(self, seq):
        return self.down(seq)

    def __call__(self, seq, centroids):
        rawret = self.down(seq)
        sims = jnp.dot(l2_normalize(rawret), l2_normalize(centroids).T,
                       preferred_element_type=jnp.float32)
        return jax.nn.softmax(sims, axis=1)


def sum_pool_by_graph(node_feats: jax.Array, graph_ids: jax.Array,
                      num_graphs: int,
                      mask: jax.Array | None = None) -> jax.Array:
    """Per-graph sum pooling (vectorized ``split_and_batchify_graph_feats``)."""
    if mask is not None:
        node_feats = node_feats * mask.astype(node_feats.dtype)[:, None]
    return jax.ops.segment_sum(node_feats, graph_ids,
                               num_segments=num_graphs)


def distance_to_center(x: jax.Array, centers: jax.Array) -> jax.Array:
    """Squared euclidean ``(N, K)`` distance matrix (``distance2center``)."""
    xx = jnp.sum(x * x, axis=1, keepdims=True)
    cc = jnp.sum(centers * centers, axis=1)[None, :]
    return xx + cc - 2.0 * jnp.dot(x, centers.T,
                                   preferred_element_type=jnp.float32)


def onehot(labels: jax.Array, num_classes: int) -> jax.Array:
    return jax.nn.one_hot(labels, num_classes)
