"""Packed-table wide gather for the fused edge propagation: worth it?

Finding (experiments/gather_microbench.py): XLA's row gather is FASTER in
absolute time for bf16 128-lane rows than for 64-lane rows (3.85 vs
4.66 ms at 2M rows on v5e) — sub-128-lane rows hit a padded/masked path.
The edge step's six 2M-row gathers all fetch 64-wide rows, so re-laying
the table as ``(N/2, 128)`` (row m = [x[2m] | x[2m+1]]) and gathering
``packed[idx >> 1]`` fetches full-lane rows.

The catch: selecting the correct 64-lane half per edge needs the parity
``idx & 1`` per ROW — the expensive sublane-major direction (the same
relayout the in-triangle weight trick avoids, ~2 ms/pass). Fold the
select into the triangle instead: with per-edge weights w and parity p,

  excl = (tri ⊙ w·(1-p)) @ x_wide[:, :D] + (tri ⊙ w·p) @ x_wide[:, D:]

— both scales stay in the triangle's free (lane-major) column direction,
at the cost of DOUBLING the triangular matmuls (~0.7 ms/pass of extra
MXU at 2M x 64). Whether the gather+DMA gain beats the extra MXU is an
empirical question -> this benchmark.

Arms (forward pass only, 2M edges, D=64, N=256k, receiver-sorted):
  A: production — bf16 row gather + sorted_segment_sum_packed_w
  B: packed table — (N/2, 128) bf16 gather + dual-scaled-triangle kernel

Run on the real chip: python experiments/packed_table_gather_bench.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ragraph_tpu.ops.pallas_segment import (_packed_boundary,
                                            sorted_segment_sum_packed_w)

N, D, E = 1 << 18, 64, 1 << 21
BLOCK = 512
ITERS = 20


def _pt_scan_kernel(x_ref, wlo_ref, whi_ref, out_ref, total_ref, carry, *,
                    half: int):
    """Dual-half scan over WIDE (2D) rows with the half-select folded into
    two column-scaled strict triangles (see module doc)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    x = x_ref[:].astype(jnp.bfloat16)              # (2*half, 2D)
    wlo = wlo_ref[:].astype(jnp.bfloat16)          # (2*half/128, 128)
    whi = whi_ref[:].astype(jnp.bfloat16)
    d = x.shape[1] // 2
    nt = half // 128
    row = jax.lax.broadcasted_iota(jnp.int32, (half, half), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (half, half), 1)
    tris = (col < row).astype(x.dtype)

    def scaled_tri(wh):
        return jnp.concatenate(
            [tris[:, r * 128:(r + 1) * 128] * wh[r:r + 1, :]
             for r in range(nt)], axis=1)

    def wsum(wh, xh):
        return sum(jnp.dot(wh[r:r + 1, :], xh[r * 128:(r + 1) * 128],
                           preferred_element_type=jnp.float32)
                   for r in range(nt))

    halves = []
    totals = []
    for h in range(2):
        xh = x[h * half:(h + 1) * half]
        lo, hi = xh[:, :d], xh[:, d:]
        wl = wlo[h * nt:(h + 1) * nt]
        wh_ = whi[h * nt:(h + 1) * nt]
        excl = (jnp.dot(scaled_tri(wl), lo,
                        preferred_element_type=jnp.float32)
                + jnp.dot(scaled_tri(wh_), hi,
                          preferred_element_type=jnp.float32))
        halves.append(excl)
        totals.append(wsum(wl, lo) + wsum(wh_, hi))
    c = carry[:]
    out_ref[:] = jnp.concatenate([c + halves[0],
                                  (c + totals[0]) + halves[1]], axis=1)
    new_c = (c + totals[0]) + totals[1]
    carry[:] = new_c
    total_ref[:] = new_c


@functools.partial(jax.jit, static_argnames=("block",))
def packed_table_segsum(table_packed, w_lo, w_hi, idx_half, indptr,
                        block: int = BLOCK):
    rows = table_packed[idx_half]                  # (E, 2D) full-lane rows
    n, d2 = rows.shape
    d = d2 // 2
    two = 2 * block
    excl, total = pl.pallas_call(
        functools.partial(_pt_scan_kernel, half=block),
        grid=(n // two,),
        in_specs=[pl.BlockSpec((two, d2), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((two // 128, 128), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((two // 128, 128), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((block, d2), lambda j: (j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, d), lambda j: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n // 2, d2), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
    )(rows, w_lo.reshape(n // 128, 128), w_hi.reshape(n // 128, 128))
    return _packed_boundary(excl, total, indptr, n, block, d)


@functools.partial(jax.jit, static_argnames=("block",))
def production_segsum(table, w, idx, indptr, block: int = BLOCK):
    tb = jax.lax.optimization_barrier(table.astype(jnp.bfloat16))
    rows = tb[idx]
    return sorted_segment_sum_packed_w(rows, w, indptr, block=block)


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    recv = np.sort(rng.integers(0, N, E)).astype(np.int32)
    send = rng.integers(0, N, E).astype(np.int32)
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(recv, minlength=N))]).astype(np.int32)
    w = rng.random(E).astype(np.float32)
    parity = (send & 1).astype(np.float32)

    idx = jnp.asarray(send)
    idx_half = jnp.asarray(send >> 1)
    w_j = jnp.asarray(w)
    w_lo = jnp.asarray(w * (1 - parity))
    w_hi = jnp.asarray(w * parity)
    ip = jnp.asarray(indptr)
    table_packed = jax.jit(
        lambda t: jax.lax.optimization_barrier(
            t.astype(jnp.bfloat16)).reshape(N // 2, 2 * D))(table)

    # correctness first (tolerance: B accumulates two f32 dots where A
    # accumulates one — rounding-order noise only)
    a = production_segsum(table, w_j, idx, ip)
    b = packed_table_segsum(table_packed, w_lo, w_hi, idx_half, ip)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"max rel diff A vs B: {err:.2e}")
    assert err < 5e-4, "packed-table kernel disagrees"

    def sync(r):
        return float(jnp.ravel(r)[0])

    x8 = jnp.ones((8, 8))
    for _ in range(3):
        sync(x8 * 2)
    t0 = time.perf_counter()
    sync(x8 * 3)
    rt = time.perf_counter() - t0

    def timeit(fn, *args):
        sync(fn(*args))
        t0 = time.perf_counter()
        rs = [fn(*args) for _ in range(ITERS)]
        sync(rs[-1])
        return max(time.perf_counter() - t0 - rt, 1e-9) / ITERS

    ta = timeit(production_segsum, table, w_j, idx, ip)
    tb = timeit(packed_table_segsum, table_packed, w_lo, w_hi, idx_half, ip)
    print(f"A production (64-lane gather + packed_w scan): {ta*1e3:7.3f} ms")
    print(f"B packed table (128-lane gather + 2x-tri scan): {tb*1e3:7.3f} ms"
          f"  -> {ta/tb:.2f}x")
    # include the per-layer repack cost B would pay in the real step
    repack = jax.jit(lambda t: jax.lax.optimization_barrier(
        t.astype(jnp.bfloat16)).reshape(N // 2, 2 * D))
    tr = timeit(repack, table)
    print(f"B table repack (per layer, amortized over the pass): "
          f"{tr*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
