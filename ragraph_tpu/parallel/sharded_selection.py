"""Distributed exact k-th selection + huge-k RAG fusion, idx-sharded.

The koubei/taobao vanilla configs retrieve the top-100,000 resource rows
per node (``retrieve_num=100000``, ``EDGE_DATASET_CONFIGS`` —
``models/edge/ragraph_edge.py``; the reference chunks a dense
``torch.topk`` on one GPU, ``RAGraph_edge/modules/RAGraph.py:298-324``).
Single-chip, ``RAGraphEdge._fuse_rag``'s huge-k branch replaces the sort
with the radix k-th-score threshold (``ops/selection``) + membership
matmul. This module distributes that same math over a row-sharded
library so the fusion scales past one HBM and its wall time divides by
the mesh:

1. each device scores the replicated query chunk against its R/D local
   rows — the ``(Q, R)`` score matrix only ever exists as ``(Q, R/D)``
   shards;
2. the radix search runs on local ordered keys with the per-pass rank
   counts ``psum``'d over ICI — one ``(Q, 2^w - 1)`` int32 reduction per
   pass. f32 shards use uint32 keys (11 passes); the bf16 tier
   (``selection_dtype="bf16"``) searches native uint16 keys in 6
   half-width passes. Counts are exact integer sums either way, so the
   global threshold is **bitwise-equal** to the same-dtype single-device
   selection (``tests/test_sharded_selection.py`` asserts it);
3. the membership mean's partial sums (``count`` and
   ``member @ values``) complete with one more psum.

ICI traffic per chunk is ~11 x Q x 7 ints + Q x E floats — independent
of R. Compute per device is the single-chip cost / D: the selection's
HBM passes stream R/D-row shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ragraph_tpu.ops.selection import (bf16_to_ordered_key,
                                       f32_to_ordered_key,
                                       ordered_key_to_bf16,
                                       ordered_key_to_f32)
from ragraph_tpu.ops.similarity import l2_normalize


def kth_largest_psum(x_local: jax.Array, k: int, axis_name: str,
                     r_global: int) -> jax.Array:
    """Exact k-th largest over rows SHARDED across ``axis_name``.

    For use inside an existing ``shard_map``: ``x_local (Q, R_local)`` is
    this device's column shard of a global ``(Q, R_global)`` matrix.
    Returns the replicated ``(Q, 1)`` global k-th largest value —
    bitwise-equal to ``rowwise_kth_largest`` on the concatenated matrix
    (a ``bfloat16`` shard runs the native 16-bit search, 6 passes/psums
    instead of 11, matching the single-device bf16 tier).

    Same radix-8 search as the single-device op; the only distributed
    part is the rank count, an integer psum per pass (the seven
    candidate thresholds of a pass share one psum).
    """
    q_len = x_local.shape[0]
    k = max(1, min(k, r_global))
    bf16 = x_local.dtype == jnp.bfloat16
    key = (bf16_to_ordered_key(x_local) if bf16
           else f32_to_ordered_key(x_local))
    utype = key.dtype

    def step(lo, shift, width):
        cands = [lo | (utype.type(j) << shift)
                 for j in range(1, 2 ** width)]
        # one fused compare+count stream per shard, ONE psum per pass
        cnt_local = jnp.stack(
            [(key >= c).sum(axis=1) for c in cands], axis=1)  # (Q, 2^w-1)
        cnt = jax.lax.psum(cnt_local, axis_name)
        best = lo
        for j, c in enumerate(cands):
            best = jnp.where(cnt[:, j:j + 1] >= k, c, best)
        return best

    lo = jnp.zeros((q_len, 1), utype)
    if bf16:
        lo = step(lo, utype.type(14), 2)  # bits 15..14

        def body(i, lo):
            shift = utype.type(11) - utype.type(3) * i.astype(utype)
            return step(lo, shift, 3)

        lo = jax.lax.fori_loop(0, 4, body, lo)   # bits 13..2
        lo = step(lo, utype.type(0), 2)          # bits 1..0
        return ordered_key_to_bf16(lo)

    lo = step(lo, utype.type(30), 2)  # bits 31..30

    def body(i, lo):
        shift = utype.type(27) - utype.type(3) * i.astype(utype)
        return step(lo, shift, 3)

    lo = jax.lax.fori_loop(0, 10, body, lo)
    return ordered_key_to_f32(lo)


def sharded_kth_largest(mesh: Mesh, x: jax.Array, k: int,
                        axis_name: str = "idx") -> jax.Array:
    """Exact row-wise k-th largest of ``x (Q, R)`` with columns sharded
    over ``axis_name`` — the distributed ``rowwise_kth_largest``.

    ``R`` must divide by the axis size. Returns replicated ``(Q, 1)``,
    bitwise-equal to the single-device op.
    """
    r_global = x.shape[1]

    def local(xl):
        return kth_largest_psum(xl, k, axis_name, r_global)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis_name),
        out_specs=P(),
        check_vma=False,  # psum'd counts make the result replicated
    )(x)


def sharded_huge_k_fuse(mesh: Mesh, queries: jax.Array, keys_n: jax.Array,
                        values: jax.Array, k: int,
                        valid_mask: jax.Array | None = None,
                        axis_name: str = "idx"):
    """Mean of each query's top-k retrieved rows, library row-sharded.

    The distributed twin of ``RAGraphEdge._fuse_rag``'s huge-k branch
    (same math: k-th-score threshold + membership matmul; the threshold
    is bitwise-equal, the mean differs only by f32 psum reassociation).

    Args:
      queries: ``(Q, E)`` replicated, NOT yet normalized (normalized
        inside, matching ``_fuse_rag``).
      keys_n: ``(R, E)`` L2-normalized library keys, rows sharded over
        ``axis_name`` (R divisible by the axis size).
      values: ``(R, Ev)`` library values, sharded like ``keys_n``.
      valid_mask: optional ``(R,)`` bool, sharded like ``keys_n`` — rows
        where False (e.g. divisibility padding) never score or
        contribute. With fewer than k valid rows the threshold reaches
        -inf and the mean degrades to the mean of all valid rows.

    Returns replicated ``(mean (Q, Ev) f32, count (Q,) int32)``.
    """
    if valid_mask is None:
        valid_mask = jnp.ones((keys_n.shape[0],), dtype=bool)
    r_global = keys_n.shape[0]

    def local(q, kl, vl, vm):
        qn = l2_normalize(q).astype(kl.dtype)
        # a bf16 key table selects the bf16 selection tier end-to-end:
        # bf16 scores -> 16-bit radix search (6 psums instead of 11)
        sel_dtype = (jnp.bfloat16 if kl.dtype == jnp.bfloat16
                     else jnp.float32)
        scores = jnp.dot(qn, kl.T,
                         preferred_element_type=sel_dtype)    # (Q, R/D)
        scores = jnp.where(vm[None, :], scores, -jnp.inf)
        kth = kth_largest_psum(scores, k, axis_name, r_global)
        member = (scores >= kth) & vm[None, :]
        count = jax.lax.psum(
            member.sum(axis=1, keepdims=True), axis_name)   # (Q, 1)
        s = jax.lax.psum(
            jnp.dot(member.astype(vl.dtype), vl,
                    preferred_element_type=jnp.float32), axis_name)
        return s / jnp.maximum(count, 1), count[:, 0].astype(jnp.int32)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,  # psums make both outputs replicated
    )(queries, keys_n, values, valid_mask)
