"""Exact row-wise k-th-largest selection without a sort.

The huge-k RAG fusion (koubei/taobao ``retrieve_num=100000`` vanilla
configs, ``EDGE_DATASET_CONFIGS``) needs the k-th largest score per query
row as the membership threshold (``models/edge/ragraph_edge.py::_fuse_rag``
— replaces the reference's chunked ``torch.topk``,
``RAGraph_edge/modules/RAGraph.py:298-324``). ``lax.top_k`` at k=100k is a
near-full sort: **256.3 ms** per (256, 442k) chunk on v5e.

TPU-native selection: map f32 to order-preserving uint32 keys (sign-flip
transform) and radix-search the k-th value three bits per pass — 11 fused
compare+count passes over the score matrix, each a VPU stream at HBM
bandwidth (the seven thresholds of a pass share one read): **10.7 ms**
on the same chunk (23.9x vs the sort; the radix-width study in
``experiments/radix_select_bench.py`` measured radix-2/4/8 at
23.3/13.6/10.7 ms — wider radixes win while the op stays HBM-bound),
bitwise-equal to the sort's k-th value (verified on-chip; there is no
approximation — the search converges to the exact multiset element).

Monotonic bijection for IEEE-754 totally-ordered finite floats and
infinities: ``u = bitcast(x); key = sign(u) ? ~u : u | 0x80000000``.
NaNs are not ordered and must not appear (cosine scores are finite).

**bf16 tier**: a ``bfloat16`` input runs the same search natively on
16-bit keys — 6 half-width passes instead of 11 full-width ones, ~3.7x
less HBM traffic. Measured **1.76x** on-chip (6.15 vs 10.81 ms at the
koubei chunk shape, v5e): uint16 compare+count streams run well below
the f32 streams' fraction of peak bandwidth — the same narrow-lane
effect as the 64-lane DMA lesson in docs/KERNEL_NOTES.md. Still EXACT
on the bf16 multiset; the approximation (more ties at the k-th value,
so ``x >= kth`` admits slightly more than k members) enters only when
the caller rounds f32 scores to bf16 first — see
``EdgeModelConfig.selection_dtype``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def f32_to_ordered_key(x: jax.Array) -> jax.Array:
    """Map f32 to order-preserving uint32 keys (see module docstring).
    Exposed for the distributed selection (``parallel/sharded_selection``),
    which runs the same radix search with psum'd counts."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jnp.where((u >> 31) != 0, ~u, u | jnp.uint32(0x80000000))


def ordered_key_to_f32(lo: jax.Array) -> jax.Array:
    """Inverse of :func:`f32_to_ordered_key`."""
    back = jnp.where(lo >= jnp.uint32(0x80000000),
                     lo & jnp.uint32(0x7FFFFFFF), ~lo)
    return jax.lax.bitcast_convert_type(back, jnp.float32)


def bf16_to_ordered_key(x: jax.Array) -> jax.Array:
    """Order-preserving uint16 keys for bfloat16 (same sign-flip form)."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.bfloat16), jnp.uint16)
    return jnp.where((u >> 15) != 0, ~u, u | jnp.uint16(0x8000))


def ordered_key_to_bf16(lo: jax.Array) -> jax.Array:
    """Inverse of :func:`bf16_to_ordered_key`."""
    back = jnp.where(lo >= jnp.uint16(0x8000),
                     lo & jnp.uint16(0x7FFF), ~lo)
    return jax.lax.bitcast_convert_type(back, jnp.bfloat16)


@partial(jax.jit, static_argnames=("k",))
def rowwise_kth_largest(x: jax.Array, k: int) -> jax.Array:
    """Exact k-th largest value of each row of ``x (Q, R)`` as ``(Q, 1)``.

    Equivalent to ``lax.top_k(x, k)[0][:, -1:]`` (same value under ties —
    it IS the k-th order statistic, so ``x >= kth`` membership matches the
    sort's semantics exactly), at ~24x the speed for large k on TPU.

    A ``bfloat16`` input runs the native 16-bit search (6 passes over
    half-width keys, 1.76x measured) and returns the exact bf16 k-th
    order statistic in bf16; every other dtype is cast to f32 first.

    ``k`` is clamped to ``[1, R]``. NaN inputs are undefined.
    """
    q_len, r_len = x.shape
    k = max(1, min(k, r_len))
    bf16 = x.dtype == jnp.bfloat16
    key = bf16_to_ordered_key(x) if bf16 else f32_to_ordered_key(x)
    utype = key.dtype

    def step(lo, shift, width):
        # radix-2^width: resolve `width` bits per pass. All 2^width - 1
        # candidate thresholds share one streaming read of `key` (XLA
        # fuses the compares+counts into a single multi-output
        # reduction), so the op is HBM-bound at one pass per read; the
        # answer is the largest extension whose rank count is still
        # >= k. Radix-8 measured fastest (experiments/
        # radix_select_bench.py): the extra VPU compares are free next
        # to the memory stream up to at least 7 thresholds per pass.
        best = lo
        for j in range(1, 2 ** width):
            cand = lo | (utype.type(j) << shift)
            cnt = (key >= cand).sum(axis=1, keepdims=True)
            best = jnp.where(cnt >= k, cand, best)
        return best

    lo = jnp.zeros((q_len, 1), utype)
    if bf16:
        lo = step(lo, utype.type(14), 2)  # bits 15..14

        def body(i, lo):
            # bits 13..2 in four 3-bit passes
            shift = utype.type(11) - utype.type(3) * i.astype(utype)
            return step(lo, shift, 3)

        lo = jax.lax.fori_loop(0, 4, body, lo)
        lo = step(lo, utype.type(0), 2)   # bits 1..0
        return ordered_key_to_bf16(lo)

    lo = step(lo, utype.type(30), 2)  # bits 31..30

    def body(i, lo):
        # bits 29..0 in ten 3-bit passes
        shift = utype.type(27) - utype.type(3) * i.astype(utype)
        return step(lo, shift, 3)

    lo = jax.lax.fori_loop(0, 10, body, lo)
    return ordered_key_to_f32(lo)
