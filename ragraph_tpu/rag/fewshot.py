"""Few-shot class-prototype helpers and the FewShotBase predictor.

Parity targets:
- ``fewshot_mean`` / ``fewshot_mean_logits`` — per-class mean of support
  logits (``RAGraph_node_fewshot/ragraph_utils/utility.py:75-127``);
- ``fewshot_predict_logits`` — cosine similarity of query logits to class
  prototypes (``:128-134``);
- ``fewshot_predict_labels_by_mean`` — argmax over those similarities
  (``:152-162``);
- ``fewshot_predict_loss`` — MSE to the gold class prototype (``:102-113``);
- ``FewShotBase`` — decode-then-cosine-to-support-set predictor
  (``RAGraph_graph/ragraph_utils/FewShotBase.py:6-27``).

All are jit-safe segment reductions / matmuls (no per-class Python loops).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ragraph_tpu.ops.similarity import cosine_similarity, l2_normalize


@partial(jax.jit, static_argnames=("num_classes",))
def fewshot_mean_logits(fewshot_logits: jax.Array, fewshot_labels: jax.Array,
                        num_classes: int) -> jax.Array:
    """Per-class mean of support logits -> ``(C, H)`` prototypes."""
    sums = jax.ops.segment_sum(fewshot_logits, fewshot_labels,
                               num_segments=num_classes)
    counts = jax.ops.segment_sum(jnp.ones_like(fewshot_labels,
                                               dtype=fewshot_logits.dtype),
                                 fewshot_labels, num_segments=num_classes)
    return sums / jnp.maximum(counts, 1.0)[:, None]


@jax.jit
def fewshot_predict_logits(mean_fewshot_logits: jax.Array,
                           logits: jax.Array) -> jax.Array:
    """Cosine similarity ``(N, H) x (C, H) -> (N, C)``."""
    return jnp.dot(l2_normalize(logits), l2_normalize(mean_fewshot_logits).T,
                   preferred_element_type=jnp.float32)


def fewshot_predict_labels(mean_fewshot_logits: jax.Array,
                           logits: jax.Array) -> jax.Array:
    """Nearest-prototype predicted class indices."""
    return jnp.argmax(fewshot_predict_logits(mean_fewshot_logits, logits),
                      axis=-1)


def fewshot_predict_loss(mean_fewshot_logits: jax.Array, logits: jax.Array,
                         labels: jax.Array,
                         mask: jax.Array | None = None) -> jax.Array:
    """MSE between query logits and their gold class prototype."""
    gold = mean_fewshot_logits[labels]
    per = jnp.mean((logits - gold) ** 2, axis=-1)
    if mask is not None:
        m = mask.astype(per.dtype)
        return jnp.sum(per * m) / jnp.maximum(m.sum(), 1.0)
    return jnp.mean(per)


class FewShotBase:
    """Cosine-to-support predictor over a fixed fewshot test set.

    Holds frozen support embeddings + one-hot labels; ``__call__`` decodes
    both query and support through the task decoder and predicts by
    ``similarity @ onehot`` (``FewShotBase.py:17-27``).
    """

    def __init__(self, support_embeddings: jax.Array,
                 support_labels: jax.Array, num_classes: int):
        self.support_embeddings = support_embeddings
        self.support_onehot = jax.nn.one_hot(support_labels, num_classes)

    def __call__(self, search_embeddings: jax.Array, decoder_apply) -> jax.Array:
        q = decoder_apply(search_embeddings)
        s = decoder_apply(self.support_embeddings)
        sim = cosine_similarity(q, s)
        return jnp.dot(sim, self.support_onehot,
                       preferred_element_type=jnp.float32)
