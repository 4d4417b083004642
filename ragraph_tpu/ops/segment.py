"""Segment/scatter primitives.

The reference hand-rolls ``scatter_sum``/``scatter_add`` in pure PyTorch
(``RAGraph_edge/modules/utils.py:6-37``) and uses ``torch_scatter``'s
``scatter_softmax`` for relative edge-time normalization
(``RAGraph_edge/modules/RAGraph.py:261``). On TPU these are XLA segment
reductions — sorted or unsorted scatter-adds that XLA lowers efficiently;
no custom kernel needed at reference scale.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def scatter_sum(src: jax.Array, index: jax.Array, num_segments: int) -> jax.Array:
    """Sum ``src`` rows into ``num_segments`` buckets keyed by ``index``."""
    return jax.ops.segment_sum(src, index, num_segments=num_segments)


@partial(jax.jit, static_argnames=("num_segments",))
def segment_softmax(logits: jax.Array, segment_ids: jax.Array,
                    num_segments: int,
                    mask: jax.Array | None = None) -> jax.Array:
    """Numerically-stable softmax within segments (per-destination-node).

    Matches ``torch_scatter.scatter_softmax`` semantics over a flat vector.
    Masked entries get probability 0 and do not affect their segment.
    """
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(mask, exp, 0.0)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    return exp / jnp.maximum(denom[segment_ids], 1e-16)
