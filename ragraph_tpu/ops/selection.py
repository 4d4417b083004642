"""Exact row-wise k-th-largest selection without a sort.

The huge-k RAG fusion (koubei/taobao ``retrieve_num=100000`` vanilla
configs, ``EDGE_DATASET_CONFIGS``) needs the k-th largest score per query
row as the membership threshold (``models/edge/ragraph_edge.py::_fuse_rag``
— replaces the reference's chunked ``torch.topk``,
``RAGraph_edge/modules/RAGraph.py:298-324``). ``lax.top_k`` at k=100k is a
near-full sort: **256.3 ms** per (256, 442k) chunk on v5e.

TPU-native selection: map f32 to order-preserving uint32 keys (sign-flip
transform) and radix-search the k-th value two bits per pass — 16 fused
compare+count passes over the score matrix, each a VPU stream at HBM
bandwidth (the three thresholds of a pass share one read): **13.6 ms**
on the same chunk (18.9x vs the sort, 1.72x vs the bit-at-a-time search's
23.3 ms), bitwise-equal to the sort's k-th value (verified on-chip; there
is no approximation — the search converges to the exact multiset element).

Monotonic bijection for IEEE-754 totally-ordered finite floats and
infinities: ``u = bitcast(x); key = sign(u) ? ~u : u | 0x80000000``.
NaNs are not ordered and must not appear (cosine scores are finite).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k",))
def rowwise_kth_largest(x: jax.Array, k: int) -> jax.Array:
    """Exact k-th largest value of each row of ``x (Q, R)`` as ``(Q, 1)``.

    Equivalent to ``lax.top_k(x, k)[0][:, -1:]`` (same value under ties —
    it IS the k-th order statistic, so ``x >= kth`` membership matches the
    sort's semantics exactly), at ~19x the speed for large k on TPU.

    ``k`` is clamped to ``[1, R]``. NaN inputs are undefined.
    """
    q_len, r_len = x.shape
    k = max(1, min(k, r_len))
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    key = jnp.where((u >> 31) != 0, ~u, u | jnp.uint32(0x80000000))

    def body(i, lo):
        # radix-4: resolve TWO bits per pass. The three candidate
        # thresholds share one streaming read of `key` (XLA fuses the
        # compares+counts into a single multi-output reduction), so this
        # halves the pass count of the bit-at-a-time search — the op is
        # HBM-bound, 16 reads instead of 32.
        b_hi = jnp.uint32(1) << (jnp.uint32(31) - 2 * i.astype(jnp.uint32))
        b_lo = b_hi >> 1
        c01 = lo | b_lo
        c10 = lo | b_hi
        c11 = lo | b_hi | b_lo
        n01 = (key >= c01).sum(axis=1, keepdims=True)
        n10 = (key >= c10).sum(axis=1, keepdims=True)
        n11 = (key >= c11).sum(axis=1, keepdims=True)
        # largest 2-bit extension whose count is still >= k
        return jnp.where(n11 >= k, c11,
                         jnp.where(n10 >= k, c10,
                                   jnp.where(n01 >= k, c01, lo)))

    lo = jax.lax.fori_loop(0, 16, body,
                           jnp.zeros((q_len, 1), jnp.uint32))
    back = jnp.where(lo >= jnp.uint32(0x80000000),
                     lo & jnp.uint32(0x7FFFFFFF), ~lo)
    return jax.lax.bitcast_convert_type(back, jnp.float32)
