"""LoRA factors for embedding-table fine-tuning.

Parity: the edge RAGraph fine-tune initializes low-rank factors from the
truncated SVD of the pretrained embedding table — ``A = U_r Σ_r``,
``B = V_rᵀ`` — and adds ``dropout(A @ B)`` to the frozen table
(``RAGraph_edge/modules/RAGraph.py:122-160,269-271``).

TPU note: the SVD runs once at setup (host/XLA ``jnp.linalg.svd``); the
per-step work is a skinny ``(N, r) @ (r, E)`` matmul that XLA fuses into
the embedding read.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LoRAFactors(NamedTuple):
    a: jax.Array  # (N, r)
    b: jax.Array  # (r, E)


def svd_init(table: jax.Array, rank: int,
             scale: float = 1.0) -> LoRAFactors:
    """Truncated-SVD LoRA init: ``A = scale · U_r diag(S_r)``,
    ``B = V_rᵀ``. ``scale=1`` is the reference's init (delta =
    rank_r(table) at step 0); ``scale=0`` is a zero-delta start that
    keeps the SVD row space in B."""
    u, s, vt = jnp.linalg.svd(table, full_matrices=False)
    return LoRAFactors(a=scale * u[:, :rank] * s[:rank][None, :],
                       b=vt[:rank, :])


def apply_lora(base: jax.Array, factors: LoRAFactors,
               dropout_rate: float = 0.0,
               key: jax.Array | None = None) -> jax.Array:
    """``base + dropout(A @ B)`` (dropout active only when a key is given)."""
    delta = jnp.dot(factors.a, factors.b, preferred_element_type=jnp.float32)
    if dropout_rate > 0.0 and key is not None:
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, delta.shape)
        delta = jnp.where(keep, delta / (1.0 - dropout_rate), 0.0)
    return base + delta
