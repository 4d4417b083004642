"""Similarity kernels.

Reference: ``RAGraph_node/ragraph_utils/SimilarityFunctions.py:6-18`` —
cosine similarity as normalize-both-sides + matmul. On TPU this is exactly
one ``(Q, E) @ (E, R)`` MXU matmul after two cheap VPU normalizations, so
there is nothing to hand-fuse at small scale; the blocked/fused variant for
huge ``R`` lives in ``ragraph_tpu.ops.pallas_retrieval``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Row-wise L2 normalization (torch ``F.normalize(p=2)`` semantics).

    Formulated as ``x * rsqrt(max(Σx², eps²))`` so the gradient at an
    exactly-zero row (padding) is finite — a plain ``x / sqrt(Σx²)`` has a
    NaN gradient at 0, which would poison masked losses (0·NaN = NaN).
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


@jax.jit
def cosine_similarity(queries: jax.Array, keys: jax.Array) -> jax.Array:
    """``(Q, E) x (R, E) -> (Q, R)`` cosine similarity matrix."""
    q = l2_normalize(queries)
    k = l2_normalize(keys)
    return jnp.dot(q, k.T, preferred_element_type=jnp.float32)


@jax.jit
def jaccard_similarity(adj: jax.Array) -> jax.Array:
    """All-pairs neighbourhood Jaccard similarity ``(N, N)``.

    Parity target: ``calculate_jaccard_similarity``
    (``RAGraph_node/ragraph_utils/SimilarityFunctions.py:19-31``) —
    |N(u) ∩ N(v)| / |N(u) ∪ N(v)| over adjacency rows, 0 when the union
    is empty. The reference helper is UNUSED by any caller and
    non-functional as written (it calls ``torch.intersect1d`` /
    ``torch.union1d``, which do not exist in torch — numpy names); this
    implements the intended semantics.

    TPU-native form: for a boolean adjacency, the pairwise intersection
    counts are one ``A @ A.T`` MXU matmul; unions come from degrees by
    inclusion–exclusion. No per-pair set ops, no dynamic shapes.
    """
    a = (adj != 0).astype(jnp.float32)
    inter = jnp.dot(a, a.T, preferred_element_type=jnp.float32)
    deg = jnp.sum(a, axis=1)
    union = deg[:, None] + deg[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)
