"""Embedding gating (GraphPro-style temporal adaptation).

Parity: learned gate ``dropout(x * sigmoid(x @ W + b))`` at fine-tune
(``RAGraph_edge/modules/RAGraph.py:166-171``) and the *random* gate used in
the ``for_tune`` phase — freshly sampled row-normalized Gaussian ``W``/``b``
each call (``RAGraph_edge/modules/RAGraph.py:177-183``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ragraph_tpu.ops.similarity import l2_normalize


def learned_gate(x: jax.Array, weight: jax.Array, bias: jax.Array,
                 dropout_rate: float = 0.0,
                 key: jax.Array | None = None) -> jax.Array:
    """``dropout(x * sigmoid(x @ W + b))``."""
    out = x * jax.nn.sigmoid(x @ weight + bias)
    if dropout_rate > 0.0 and key is not None:
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, out.shape)
        out = jnp.where(keep, out / (1.0 - dropout_rate), 0.0)
    return out


def random_gate(x: jax.Array, key: jax.Array) -> jax.Array:
    """Gate with fresh row-normalized Gaussian weights (``for_tune`` phase)."""
    emb = x.shape[-1]
    kw, kb = jax.random.split(key)
    w = l2_normalize(jax.random.normal(kw, (emb, emb)), axis=-1)
    b = l2_normalize(jax.random.normal(kb, (1, emb)), axis=-1)
    return x * jax.nn.sigmoid(x @ w + b)
