"""Sorted-segment-sum via a streaming Pallas prefix sum.

The edge models' hot reduction is ``out[r] += msgs[e]`` over edges sorted
by receiver (``models/edge/base.py::lightgcn_propagate``). XLA lowers
``jax.ops.segment_sum`` to scatter-add, which runs ~25x off HBM bandwidth
on TPU (measured 8.9 ms for 512k x 64 rows on v5e). With *sorted* segment
ids the reduction is expressible as

    cum = exclusive_prefix_sum(msgs)         # streaming, BW-bound
    out[s] = cum[end_s] - cum[start_s]       # two gathers

The production path (``gather_scale_segsum`` -> ``_packed_scan_w_kernel``)
is a dual-half packed scan: read (2B, D) rows, one strict-triangle MXU
matmul per half whose COLUMNS carry the per-edge weights (lane-major, no
relayout), exclusive prefix written packed (B, 2D) f32 at full 128-lane
DMA width, plus a separate (1, D) grand-total output so the boundary
lookup needs no zero-row concatenate. Measured on v5e at 2M x 64:
64-lane Mosaic DMAs move ~143 GB/s vs ~350 at 128 lanes, a zero-row
concatenate costs 9.9 ms/step, and any row-scaling formulation of the
weights pays a ~2 ms/pass lane->sublane relayout — this design exists to
dodge all three.

Numerical note: the summation order differs from scatter-add and long
prefixes accumulate rounding; the kernels accumulate in f32 (inputs may
be bf16; ``matmul_bf16`` rounds scan inputs to bf16 before the MXU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tri(n, dtype):
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (col <= row).astype(dtype)


def _cumsum_body(x, out_ref, total_ref, carry, *, exclusive: bool,
                 matmul_bf16: bool):
    """In-block prefix sum on the MXU with a lower-triangular ones matrix
    (beats a log-step VPU scan by ~an order of magnitude), plus a carried
    (1, D) running total.

    ``matmul_bf16`` runs the triangular matmuls with bf16 inputs (f32
    accumulate) — 4x the f32 MXU rate on v5e; the tri matrix is exact in
    bf16 and the inputs are bf16-rounded (same numerics as feeding bf16
    messages, which is what the fused propagation always did).

    ``exclusive`` writes the EXCLUSIVE prefix (sum of rows < i) and the
    grand total to ``total_ref`` — the segment-sum consumer then needs no
    zero-row concatenate (measured 9.9 ms per step of pure copy at
    2M x 64 f32 on v5e) and no +1 input padding copy.
    """
    block = x.shape[0]
    xm = x.astype(jnp.bfloat16) if matmul_bf16 else x
    incl = jnp.dot(_tri(block, xm.dtype), xm,
                   preferred_element_type=jnp.float32)
    c = carry[:]
    if exclusive:
        out_ref[:] = c + (incl - xm.astype(jnp.float32))
    else:
        out_ref[:] = c + incl
    new_c = c + incl[-1:, :]
    carry[:] = new_c
    if total_ref is not None:
        total_ref[:] = new_c


def _cumsum_kernel(x_ref, out_ref, total_ref, carry, *, exclusive: bool,
                   matmul_bf16: bool):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    x = x_ref[:].astype(jnp.float32)               # (block, D)
    _cumsum_body(x, out_ref, total_ref, carry, exclusive=exclusive,
                 matmul_bf16=matmul_bf16)


def _cumsum_call(x, *, block: int, interpret: bool, exclusive: bool,
                 matmul_bf16: bool, with_total: bool):
    n, d = x.shape
    pad = (-n) % block
    x_in = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    ins = [x_in]
    in_specs = [pl.BlockSpec((block, d), lambda j: (j, 0),
                             memory_space=pltpu.VMEM)]
    kernel = _cumsum_kernel
    if not with_total:
        kernel = functools.partial(_no_total, kernel)
    out_specs = [pl.BlockSpec((block, d), lambda j: (j, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct(x_in.shape, jnp.float32)]
    if with_total:
        out_specs.append(pl.BlockSpec((1, d), lambda j: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, d), jnp.float32))
    res = pl.pallas_call(
        functools.partial(kernel, exclusive=exclusive,
                          matmul_bf16=matmul_bf16),
        grid=(x_in.shape[0] // block,),
        in_specs=in_specs,
        out_specs=out_specs if with_total else out_specs[0],
        out_shape=out_shape if with_total else out_shape[0],
        scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
        interpret=interpret,
    )(*ins)
    return res if with_total else (res, None)


def _no_total(kernel, *refs, **kw):
    *ins, out_ref, carry = refs
    return kernel(*ins, out_ref, None, carry, **kw)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def streaming_cumsum(x: jax.Array, block: int = 512,
                     interpret: bool = False) -> jax.Array:
    """Inclusive prefix sum over axis 0 (f32 out), Pallas streaming."""
    out, _ = _cumsum_call(x, block=block, interpret=interpret,
                          exclusive=False, matmul_bf16=False,
                          with_total=False)
    return out[:x.shape[0]]


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
    excl, total = _cumsum_call(msgs, block=block, interpret=interpret,
                               exclusive=True, matmul_bf16=False,
                               with_total=True)
    return _boundary_diff_excl(excl, total, indptr, msgs.shape[0])


def _boundary_diff_excl(excl, total, indptr, n):
    """Per-segment sums from the exclusive prefix + grand total.

    ``excl`` may be longer than ``n`` (block padding). The boundary value
    at position ``n`` (end of the last segment) is the grand total, taken
    from the kernel's dedicated ``total`` output, so no zero-row
    concatenate and no +1 input padding is needed.
    """
    g = excl[jnp.minimum(indptr, n - 1)]          # ONE (N+1, D) gather
    g = jnp.where((indptr == n)[:, None], total[0], g)
    return g[1:] - g[:-1]


def _packed_scan_kernel(x_ref, out_ref, total_ref, carry, *, half: int,
                        matmul_bf16: bool):
    """Unweighted dual-half exclusive scan (pre-scaled messages): read
    ``(2·half, D)``, lane-concat to ``(half, 2D)``, one full-width
    strict-triangle matmul, write the exclusive prefix packed f32 (see
    ``_packed_scan_w_kernel`` for why packing matters)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    x = x_ref[:]
    if matmul_bf16:
        x = x.astype(jnp.bfloat16)
    xl, xr = x[:half], x[half:]
    xc = jnp.concatenate([xl, xr], axis=1)          # (half, 2D)
    row = jax.lax.broadcasted_iota(jnp.int32, (half, half), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (half, half), 1)
    tris = (col < row).astype(xc.dtype)
    excl = jnp.dot(tris, xc, preferred_element_type=jnp.float32)
    t_l = jnp.sum(xl.astype(jnp.float32), axis=0, keepdims=True)
    t_r = jnp.sum(xr.astype(jnp.float32), axis=0, keepdims=True)
    c = carry[:]
    out_ref[:] = excl + jnp.concatenate([c, c + t_l], axis=1)
    new_c = (c + t_l) + t_r
    carry[:] = new_c
    total_ref[:] = new_c


def _packed_scan_w_kernel(x_ref, w_ref, out_ref, total_ref, carry, *,
                          half: int, matmul_bf16: bool,
                          packed_input: bool = False):
    """Dual-half exclusive scan of ``x * w`` with the per-row scale FOLDED
    INTO the triangular matrix.

    ``w`` arrives lane-major as a ``(1, 2·half)`` row — scaling the
    triangle's *columns* broadcasts it along sublanes, which is free; any
    formulation that scales the rows of ``x`` directly needs the weights
    sublane-major, and that 1D->column relayout costs ~2 ms per 2M-edge
    pass on v5e (it shows up as convert/reshape ops in the profile).

    A STRICT triangle (col < row) yields the exclusive prefix directly:
    ``excl = (tri_strict ⊙ w) @ x`` — no inclusive-minus-row correction,
    and with bf16 inputs the w·x products accumulate in f32 unrounded.
    """
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    x = x_ref[:]
    w = w_ref[:]          # (2·half/128, 128) — natural 1D lane tiling
    if matmul_bf16:
        x = x.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)
    if packed_input:      # x is (half, 2D): [left-half edge | right-half]
        d2 = x.shape[1] // 2
        xl, xr = x[:, :d2], x[:, d2:]
    else:                 # x is (2·half, D) consecutive rows
        xl, xr = x[:half], x[half:]
    nt = half // 128      # lane tiles per half
    wl, wr = w[:nt], w[nt:]
    row = jax.lax.broadcasted_iota(jnp.int32, (half, half), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (half, half), 1)
    tris = (col < row).astype(x.dtype)

    def scaled_tri(wh):
        # scale the triangle's columns by w: per 128-column group this is
        # a (1, 128) sublane broadcast, which is free — w never needs the
        # expensive lane->sublane relayout
        return jnp.concatenate(
            [tris[:, r * 128:(r + 1) * 128] * wh[r:r + 1, :]
             for r in range(nt)], axis=1)

    def wsum(wh, xh):      # (1, D) total of w·x over the half
        return sum(jnp.dot(wh[r:r + 1, :], xh[r * 128:(r + 1) * 128],
                           preferred_element_type=jnp.float32)
                   for r in range(nt))

    excl_l = jnp.dot(scaled_tri(wl), xl, preferred_element_type=jnp.float32)
    excl_r = jnp.dot(scaled_tri(wr), xr, preferred_element_type=jnp.float32)
    t_l = wsum(wl, xl)
    t_r = wsum(wr, xr)
    c = carry[:]
    out_ref[:] = jnp.concatenate([c + excl_l, (c + t_l) + excl_r], axis=1)
    new_c = (c + t_l) + t_r
    carry[:] = new_c
    total_ref[:] = new_c


@functools.partial(jax.jit,
                   static_argnames=("block", "matmul_bf16", "interpret"))
def sorted_segment_sum_packed_w(msgs: jax.Array, w: jax.Array,
                                indptr: jax.Array, block: int = 512,
                                matmul_bf16: bool = True,
                                interpret: bool = False) -> jax.Array:
    """Segment sum of ``msgs * w[:, None]`` (rows sorted by segment) via
    the packed dual-half scan with in-triangle weighting — the hot path
    of the fused LightGCN propagation (raw gathered rows in, no separate
    scale pass)."""
    n, d = msgs.shape
    assert block % 128 == 0, "packed_w scan needs block % 128 == 0"
    two = 2 * block
    pad = (-n) % two
    x_in = jnp.pad(msgs, ((0, pad), (0, 0))) if pad else msgs
    w_in = jnp.pad(w, (0, pad)) if pad else w
    npad = x_in.shape[0]
    w2 = w_in.reshape(npad // 128, 128)            # natural 1D lane tiling
    excl, total = pl.pallas_call(
        functools.partial(_packed_scan_w_kernel, half=block,
                          matmul_bf16=matmul_bf16),
        grid=(npad // two,),
        in_specs=[pl.BlockSpec((two, d), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((two // 128, 128), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((block, 2 * d), lambda j: (j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, d), lambda j: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((npad // 2, 2 * d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
        interpret=interpret,
    )(x_in, w2)
    return _packed_boundary(excl, total, indptr, n, block, d)


@functools.partial(jax.jit,
                   static_argnames=("n", "block", "matmul_bf16",
                                    "interpret"))
def _segsum_packed2_w(msgs2: jax.Array, w: jax.Array, indptr: jax.Array,
                      n: int, block: int = 512, matmul_bf16: bool = True,
                      interpret: bool = False) -> jax.Array:
    """Packed-input variant: ``msgs2`` is ``(n/2, 2D)`` in half-split
    chunk layout (row c·B+i = [edge c·2B+i | edge c·2B+B+i]) — produced
    by two half-gathers + a lane concat, which costs no more than the
    plain row gather and feeds the scan full-width DMAs both directions.
    ``w`` stays per-edge ``(n,)``; ``n`` must divide by ``2·block``.
    """
    d2 = msgs2.shape[1]
    d = d2 // 2
    assert n % (2 * block) == 0 and msgs2.shape[0] == n // 2
    excl, total = pl.pallas_call(
        functools.partial(_packed_scan_w_kernel, half=block,
                          matmul_bf16=matmul_bf16, packed_input=True),
        grid=(n // (2 * block),),
        in_specs=[pl.BlockSpec((block, d2), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((2 * block // 128, 128), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((block, d2), lambda j: (j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, d), lambda j: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n // 2, d2), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
        interpret=interpret,
    )(msgs2, w.reshape(n // 128, 128))
    return _packed_boundary(excl, total, indptr, n, block, d)


def _packed_boundary(excl, total, indptr, n, block, d):
    # boundary lookup: position p lives at packed row
    # (p // 2B)·B + p % B, half (p // B) % 2
    two = 2 * block
    p = jnp.minimum(indptr, n - 1)
    row = (p // two) * block + p % block
    half = (p // block) % 2
    g2 = excl[row]                                 # (N+1, 2D) gather
    g = jnp.where((half == 1)[:, None], g2[:, d:], g2[:, :d])
    g = jnp.where((indptr == n)[:, None], total[0], g)
    return g[1:] - g[:-1]


@functools.partial(jax.jit,
                   static_argnames=("block", "matmul_bf16", "interpret"))
def sorted_segment_sum_packed(msgs: jax.Array, indptr: jax.Array,
                              block: int = 512, matmul_bf16: bool = True,
                              interpret: bool = False) -> jax.Array:
    """Segment sum of pre-scaled ``msgs`` (rows sorted by segment) via the
    packed dual-half scan kernel (see ``_packed_scan_kernel``).

    Requires ``msgs.shape[0]`` to be a multiple of ``2·block`` (pads with
    zero rows otherwise, which costs a copy — production edge counts are
    powers of two).
    """
    n, d = msgs.shape
    two = 2 * block
    pad = (-n) % two
    x_in = jnp.pad(msgs, ((0, pad), (0, 0))) if pad else msgs
    npad = x_in.shape[0]
    excl, total = pl.pallas_call(
        functools.partial(_packed_scan_kernel, half=block,
                          matmul_bf16=matmul_bf16),
        grid=(npad // two,),
        in_specs=[pl.BlockSpec((two, d), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((block, 2 * d), lambda j: (j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, d), lambda j: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((npad // 2, 2 * d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
        interpret=interpret,
    )(x_in)
    return _packed_boundary(excl, total, indptr, n, block, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sorted_segment_sum_grad(msgs: jax.Array, indptr: jax.Array,
                            seg_ids: jax.Array, block: int = 512,
                            interpret: bool = False):
    """Differentiable sorted segment sum (training path).

    ``seg_ids`` is the per-row segment id (the sorted receivers) — needed
    only by the backward pass, which is a plain gather:
    ``d msgs = d out[seg_ids]``. Forward runs the packed dual-half scan
    (f32 matmul — this is the AD-safe path, numerics preserved).
    """
    return sorted_segment_sum_packed(msgs, indptr, block=block,
                                     matmul_bf16=False, interpret=interpret)


def _ssg_fwd(msgs, indptr, seg_ids, block, interpret):
    return sorted_segment_sum_packed(msgs, indptr, block=block,
                                     matmul_bf16=False,
                                     interpret=interpret), seg_ids


def _ssg_bwd(block, interpret, seg_ids, ct):
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
        if bf16:
            # Barrier the cast so XLA materializes the bf16 table and the
            # row gather stays PURE — XLA fusing convert/scale into the
            # gather slows it ~1.6x (8.4 vs 5.2 ms at 2M x 64 rows on
            # v5e, see experiments/gather_microbench.py). The per-edge
            # scale happens inside the scan kernel's triangular matmul.
            table = jax.lax.optimization_barrier(emb.astype(jnp.bfloat16))
        else:
            table = emb
        # NOTE (measured): pre-packing the gather output to (E/2, 2D) via
        # two half-gathers + lane concat does NOT pay — XLA materializes
        # the concat (+3.5 ms/pass at 2M x 64) and the packed-input kernel
        # is no faster than reading the (2B, D) block directly
        # (_segsum_packed2_w kept as the packed-input entry point).
        rows = table[idx]
        return sorted_segment_sum_packed_w(rows, w, indptr, block=block,
                                           matmul_bf16=bf16,
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
