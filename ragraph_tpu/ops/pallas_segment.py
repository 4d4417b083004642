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
