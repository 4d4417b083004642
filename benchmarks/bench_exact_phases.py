"""Phase-level breakdown of the exact bucketed top-k (VERDICT r3 #5).

The two-phase exact kernel (ops/bucket_topk) runs ~2x the approx
PartialReduce path. KERNEL_NOTES argues the residual is structural
(phase 1's tile-then-reduce vs approx's in-epilogue reduction), but the
claim has never been decomposed on-chip. This times, at the bench shape
(R=262k, Q=2048, E=128, k=10), each stage in isolation:

  approx        lax.approx_max_k chain (the target)
  full          bucketed_exact_topk chain
  phase1        the Pallas bucket-maxima kernel alone
  matmul_proxy  same grid/tiles, dot only, strided 1/128 row write —
                phase1 minus the 128-group max (isolates the reduce)
  glue          column_topk over the (nb, Q) bucket-max matrix +
                pair sort/scatter assignment build
  phase23       rescore + scatter + final row_topk given a fixed
                assignment

If phase1 ≈ matmul_proxy, the extra VPU pass is already overlapped and
the 2x lives in the glue/rescore — attack there. If phase1 >>
matmul_proxy, the reduce pass is the cost and the structural argument
stands (record the numbers in KERNEL_NOTES either way).

Usage: python benchmarks/bench_exact_phases.py   (real TPU)
"""

import functools
import time

import numpy as np

R, E, Q, K = 262_144, 128, 2048, 10
ITERS = 30
BLOCK_Q, BLOCK_R = 2048, 4096


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ragraph_tpu.ops.bucket_topk import (LANE, _bucket_max_kernel,
                                             bucketed_exact_topk,
                                             column_topk)
    from ragraph_tpu.ops.similarity import l2_normalize

    rng = np.random.default_rng(4)
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(R, E)).astype(np.float32))).astype(jnp.bfloat16)
    queries = jnp.asarray(rng.normal(size=(Q, E)).astype(np.float32))
    q_bf = l2_normalize(queries).astype(jnp.bfloat16)
    vm = jnp.ones((R,), jnp.int32)
    nb = R // LANE

    def timed_chain(fn, *args):
        """fn(*args) -> array; chained ITERS times with a data dep."""
        @jax.jit
        def chain(*a):
            def body(_, carry):
                acc = fn(*a)
                return carry + acc
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
        float(chain(*args))  # compile+warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(*args))
            best = min(best, time.perf_counter() - t0)
        return best / ITERS

    # --- approx target ---
    def approx(q, kn):
        s = jnp.dot(q, kn.T, preferred_element_type=jnp.float32)
        v, _ = jax.lax.approx_max_k(s, K, recall_target=0.99)
        return v[0, 0]

    dt_approx = timed_chain(approx, q_bf, keys)

    # --- full exact ---
    def full(q, kn):
        v, _ = bucketed_exact_topk(q, kn, K, block_q=BLOCK_Q,
                                   block_r=BLOCK_R)
        return v[0, 0]

    dt_full = timed_chain(full, l2_normalize(queries), keys)

    # --- phase 1 alone ---
    def phase1(q, kn, vmm):
        bm = pl.pallas_call(
            functools.partial(_bucket_max_kernel, block_r=BLOCK_R),
            grid=(R // BLOCK_R, Q // BLOCK_Q),
            in_specs=[
                pl.BlockSpec((BLOCK_R, E), lambda j, i: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_Q, E), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_R,), lambda j, i: (j,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLOCK_R // LANE, BLOCK_Q),
                                   lambda j, i: (j, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, Q), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(kn, q, vmm)
        return bm[0, 0]

    dt_phase1 = timed_chain(phase1, q_bf, keys, vm)

    # --- matmul-only proxy: same tiles, no 128-group reduce; write a
    # strided 1/128 slice of the tile so output traffic matches phase 1
    def _mm_kernel(k_ref, q_ref, out_ref):
        tile = jnp.dot(k_ref[:], q_ref[:].T,
                       preferred_element_type=jnp.float32)
        # static index on the reshaped middle dim (the [::LANE, :]
        # strided slice lowers to a gather Mosaic rejects; the reshape
        # is the same one the real kernel's 128-group max uses)
        out_ref[:] = tile.reshape(tile.shape[0] // LANE, LANE,
                                  tile.shape[1])[:, 0, :]

    def mm_proxy(q, kn):
        bm = pl.pallas_call(
            _mm_kernel,
            grid=(R // BLOCK_R, Q // BLOCK_Q),
            in_specs=[
                pl.BlockSpec((BLOCK_R, E), lambda j, i: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_Q, E), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLOCK_R // LANE, BLOCK_Q),
                                   lambda j, i: (j, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, Q), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(kn, q)
        return bm[0, 0]

    dt_mm = timed_chain(mm_proxy, q_bf, keys)

    # --- glue alone (fixed bucket-max matrix) ---
    bm_fixed = jax.block_until_ready(jnp.asarray(
        rng.normal(size=(nb, Q)).astype(np.float32)))

    def glue(bm):
        bv, bi = column_topk(bm, K)
        bucket_ids = jnp.where(bv <= -3e38, nb, bi)
        pair_b = bucket_ids.reshape(-1)
        pair_q = jnp.repeat(jnp.arange(Q, dtype=jnp.int32), K)
        order = jnp.argsort(pair_b, stable=True)
        sb, sq = pair_b[order], pair_q[order]
        first = jnp.full((nb + 1,), Q * K, jnp.int32).at[sb].min(
            jnp.arange(Q * K, dtype=jnp.int32), mode="drop")
        rank = jnp.arange(Q * K, dtype=jnp.int32) - first[sb]
        assign = jnp.full((nb, 32), Q, dtype=jnp.int32)
        assign = assign.at[sb, jnp.minimum(rank, 31)].set(sq, mode="drop")
        return assign[0, 0].astype(jnp.float32)

    dt_glue = timed_chain(glue, bm_fixed)

    dt_phase23 = dt_full - dt_phase1 - dt_glue  # residual estimate

    print(f"R={R} Q={Q} E={E} k={K} "
          f"(block_q={BLOCK_Q}, block_r={BLOCK_R}), ms/batch:")
    print(f"  approx        {dt_approx*1e3:7.3f}")
    print(f"  full exact    {dt_full*1e3:7.3f}  "
          f"({dt_full/dt_approx:.2f}x approx)")
    print(f"  phase1        {dt_phase1*1e3:7.3f}  "
          f"({dt_phase1/dt_approx:.2f}x approx)")
    print(f"  matmul proxy  {dt_mm*1e3:7.3f}  "
          f"(reduce adds {max(dt_phase1-dt_mm,0)*1e3:.3f})")
    print(f"  glue          {dt_glue*1e3:7.3f}")
    print(f"  phase2+3 est  {dt_phase23*1e3:7.3f}  (residual)")


if __name__ == "__main__":
    from ragraph_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    main()
