"""Sorted-segment-sum via a streaming Pallas prefix sum.

The edge models' hot reduction is ``out[r] += msgs[e]`` over edges sorted
by receiver (``models/edge/base.py::lightgcn_propagate``). XLA lowers
``jax.ops.segment_sum`` to scatter-add, which runs ~25x off HBM bandwidth
on TPU (measured 8.9 ms for 512k x 64 rows on v5e). With *sorted* segment
ids the reduction is expressible as

    cum = exclusive_prefix_sum(msgs)         # streaming, BW-bound
    out[s] = cum[end_s] - cum[start_s]       # two gathers

The prefix sum here is a Pallas kernel: a sequential grid over row blocks,
log-step in-block cumsum on the VPU (roll + masked add) plus a carried
(1, D) running total in VMEM scratch — one read + one write of the data,
i.e. bandwidth-bound.

Numerical note: the summation order differs from scatter-add and long
prefixes accumulate rounding; the kernel accumulates in f32 (inputs may
be bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cumsum_kernel(x_ref, out_ref, carry, *, block: int):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    x = x_ref[:].astype(jnp.float32)               # (block, D)
    # in-block inclusive prefix sum as ONE MXU matmul with a
    # lower-triangular ones matrix: cum = L @ x (beats a log-step VPU
    # scan by ~an order of magnitude in passes)
    row = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    tri = (col <= row).astype(jnp.float32)
    cum = jnp.dot(tri, x, preferred_element_type=jnp.float32)
    cum = cum + carry[:]
    out_ref[:] = cum
    carry[:] = cum[-1:, :]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def streaming_cumsum(x: jax.Array, block: int = 512,
                     interpret: bool = False) -> jax.Array:
    """Inclusive prefix sum over axis 0 (f32 out), Pallas streaming."""
    n, d = x.shape
    pad = (-n) % block
    x_in = jnp.pad(x, ((0, pad), (0, 0)))
    grid = (x_in.shape[0] // block,)
    out = pl.pallas_call(
        functools.partial(_cumsum_kernel, block=block),
        grid=grid,
        in_specs=[pl.BlockSpec((block, d), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, d), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x_in.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
        interpret=interpret,
    )(x_in)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def sorted_segment_sum_indptr(msgs: jax.Array, indptr: jax.Array,
                              block: int = 512,
                              interpret: bool = False) -> jax.Array:
    """Segment sum of ``msgs`` whose rows are SORTED by segment.

    Args:
      msgs: ``(E, D)`` messages, rows grouped by segment in order.
      indptr: ``(N+1,)`` CSR boundaries (``indptr[s]..indptr[s+1]`` is
        segment ``s``; empty segments allowed).

    Returns ``(N, D)`` f32 sums — same result as
    ``jax.ops.segment_sum(msgs, ids)`` up to f32 summation order (the
    prefix-diff formulation cancels large partial sums, so very long
    segments see ~1e-3 relative f32 error).
    """
    cum = streaming_cumsum(msgs, block=block, interpret=interpret)
    zero = jnp.zeros((1, msgs.shape[1]), jnp.float32)
    cum0 = jnp.concatenate([zero, cum], axis=0)   # exclusive at index i
    g = cum0[indptr]                              # ONE (N+1, D) gather
    return g[1:] - g[:-1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sorted_segment_sum_grad(msgs: jax.Array, indptr: jax.Array,
                            seg_ids: jax.Array, block: int = 512):
    """Differentiable sorted segment sum (training path).

    ``seg_ids`` is the per-row segment id (the sorted receivers) — needed
    only by the backward pass, which is a plain gather:
    ``d msgs = d out[seg_ids]``.
    """
    return sorted_segment_sum_indptr(msgs, indptr, block=block)


def _ssg_fwd(msgs, indptr, seg_ids, block):
    return sorted_segment_sum_indptr(msgs, indptr, block=block), seg_ids


def _ssg_bwd(block, seg_ids, ct):
    return ct[seg_ids].astype(jnp.float32), None, None


sorted_segment_sum_grad.defvjp(_ssg_fwd, _ssg_bwd)


@functools.lru_cache(maxsize=None)
def _make_gather_scale_segsum(block: int, bf16: bool, interpret: bool):
    """Build the fused LightGCN propagation layer op (cached per config).

    Forward: ``out[r] = Σ_{e: recv_e = r} w_e · emb[send_e]`` with edges
    receiver-sorted — ONE row gather (bf16: 3x faster than f32 on v5e,
    8.4 vs 25.8 ms at 2M x 64) + the streaming prefix-sum reduction.

    Backward (the win over autodiff): ``d_emb[n] = Σ_{e: send_e = n}
    w_e · ct[recv_e]`` is the SAME computation in sender order, so with
    the precomputed ``recv_of_send``/``send_indptr`` auxiliaries it is one
    row gather + a sorted reduce (32 ms) instead of XLA's scatter-add
    transpose (55 ms at 2M x 64).

    Weights are treated as constants w.r.t. AD (true for every model
    here: binorm degrees, time encodings, and dropout masks never depend
    on parameters) — their cotangent is symbolically zero. Callers must
    supply the weights in BOTH edge orders; per-step dropout masks can be
    produced in both orders without a 2M-scalar gather via
    ``hash_edge_mask`` (models/edge/base.py).
    """

    def _run(emb, w, idx, indptr):
        rows = emb.astype(jnp.bfloat16)[idx] if bf16 else emb[idx]
        msgs = rows.astype(jnp.float32) * w[:, None]
        if bf16:
            msgs = msgs.astype(jnp.bfloat16)
        return sorted_segment_sum_indptr(msgs, indptr, block=block,
                                         interpret=interpret)

    @jax.custom_vjp
    def op(emb, w_recv, w_send, senders, recv_indptr, recv_of_send,
           send_indptr):
        return _run(emb, w_recv, senders, recv_indptr)

    def fwd(emb, w_recv, w_send, senders, recv_indptr, recv_of_send,
            send_indptr):
        out = _run(emb, w_recv, senders, recv_indptr)
        return out, (w_send, recv_of_send, send_indptr)

    def bwd(res, ct):
        w_send, recv_of_send, send_indptr = res
        d_emb = _run(ct, w_send, recv_of_send, send_indptr)
        return d_emb, None, None, None, None, None, None

    op.defvjp(fwd, bwd)
    return op


def gather_scale_segsum(emb, w_recv, w_send, senders, recv_indptr,
                        recv_of_send, send_indptr, block: int = 512,
                        bf16: bool = True, interpret: bool = False):
    """Fused differentiable LightGCN propagation layer (see the factory
    docstring above for semantics and the measured numbers)."""
    op = _make_gather_scale_segsum(block, bf16, interpret)
    return op(emb, w_recv, w_send, senders, recv_indptr, recv_of_send,
              send_indptr)


def sorted_segment_sum(msgs: jax.Array, starts: jax.Array, ends: jax.Array,
                       block: int = 512,
                       interpret: bool = False) -> jax.Array:
    """starts/ends variant (contiguous CSR: ``ends == starts[1:] + last``).

    When ``ends[i] == starts[i+1]`` (plain CSR) this delegates to the
    single-gather :func:`sorted_segment_sum_indptr`.
    """
    indptr = jnp.concatenate([starts, ends[-1:]])
    return sorted_segment_sum_indptr(msgs, indptr, block=block,
                                     interpret=interpret)
