"""Forensics for the r4 bench.py throughput-arm elision (KERNEL_NOTES).

The r4 smoke run reported ``exact_throughput_ms = 0.106`` for the exact
bucketed top-k — an impossible >1 PFLOP/s on a ~394 TFLOP/s chip — from a
``fori_loop`` whose body was *loop-invariant* (``bucketed_exact_topk(q,
kn, K)`` with no dependence on the carry or index). The dedicated phases
bench (`bench_exact_phases.py`) uses the *same* invariant structure and
was NOT elided (1.008 ms/batch, physically consistent with its own
matmul proxy). This script measures both structures at two ITERS counts
so the elision is visible as "total time does not scale with ITERS":

  invariant body : total ~ 1 batch + loop overhead   (if elided)
  indexed body   : total ~ ITERS x batch             (always)

The indexed body perturbs the query by the loop *index* — iterations
stay independent (free to pipeline across the back-edge) but are
distinct computations, so no LICM/CSE can collapse them. bench.py's
throughput arm now uses the indexed form.

Usage: python benchmarks/bench_loop_elision.py   (real TPU)
"""

import time

import numpy as np

R, E, Q, K = 262_144, 128, 2048, 10


def main():
    import jax
    import jax.numpy as jnp

    from ragraph_tpu.ops.bucket_topk import bucketed_exact_topk
    from ragraph_tpu.ops.similarity import l2_normalize

    rng = np.random.default_rng(4)
    keys_n = l2_normalize(jnp.asarray(
        rng.normal(size=(R, E)).astype(np.float32))).astype(jnp.bfloat16)
    q_n = l2_normalize(jnp.asarray(
        rng.normal(size=(Q, E)).astype(np.float32))).astype(jnp.bfloat16)

    def make_chain(iters, indexed):
        @jax.jit
        def chain(q, kn):
            def body(i, acc):
                qq = q + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)) \
                    if indexed else q
                s, _ = bucketed_exact_topk(qq, kn, K)
                return acc + s[0, 0]
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return chain

    results = {}
    for indexed in (False, True):
        for iters in (10, 50):
            chain = make_chain(iters, indexed)
            float(chain(q_n, keys_n))  # compile
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(q_n, keys_n))
                best = min(best, time.perf_counter() - t0)
            tag = f"{'indexed' if indexed else 'invariant'}_iters{iters}"
            results[tag] = best
            print(f"{tag:24s} total {best * 1e3:8.2f} ms  "
                  f"({best / iters * 1e3:6.3f} ms/iter)", flush=True)

    for kind in ("invariant", "indexed"):
        r = results[f"{kind}_iters50"] / results[f"{kind}_iters10"]
        verdict = "ELIDED (no ITERS scaling)" if r < 2.0 else \
            "real work (scales with ITERS)"
        print(f"{kind:10s} 50/10 total ratio {r:5.2f} -> {verdict}")


if __name__ == "__main__":
    main()
