"""Tile-shape sweep for the exact bucket top-k (VERDICT r2 #5).

Phase 1 of ``ops/bucket_topk.bucketed_exact_topk`` was measured at ~45%
MXU utilization; the suspected cost split is ~half matmul, ~half the
cross-sublane 128-group max reduce (f32 tile reads on the VPU). This
sweep measures end-to-end in-chain time over (block_q, block_r) and also
times the approx path for the ratio the README quotes.

Usage (real TPU):
    python benchmarks/bench_bucket_tiles.py            # tile sweep
    python benchmarks/bench_bucket_tiles.py subtile    # subtile variant
"""

import itertools
import sys
import time

import numpy as np

R, E, Q, K = 262_144, 128, 2048, 10
ITERS = 30


def _setup():
    import jax.numpy as jnp

    from ragraph_tpu.ops.similarity import l2_normalize

    rng = np.random.default_rng(0)
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(R, E)).astype(np.float32)))
    qs = l2_normalize(jnp.asarray(
        rng.normal(size=(Q, E)).astype(np.float32)))
    return qs, keys


def _chain(fn):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(q, k):
        def body(_, carry):
            qq, acc = carry
            s, _ = fn(qq, k)
            return qq + 1e-6 * s[:, :1], acc + s[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, (q, jnp.float32(0)))[1]
    return run


def _timeit(run, qs, keys):
    float(run(qs, keys))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(qs, keys))
        ts.append(time.perf_counter() - t0)
    return min(ts) / ITERS


def main():
    import jax
    import jax.numpy as jnp

    from ragraph_tpu.ops.bucket_topk import bucketed_exact_topk

    qs, keys = _setup()
    # baseline: approx
    t_approx = _timeit(_chain(
        lambda q, k: jax.lax.approx_max_k(
            jnp.dot(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32), K,
            recall_target=0.99)), qs, keys)
    print(f"approx_max_k chain: {t_approx*1e3:.3f} ms")

    results = {}
    for bq, br in itertools.product((256, 512, 1024, 2048),
                                    (2048, 4096, 8192)):
        try:
            t = _timeit(_chain(lambda q, k, bq=bq, br=br:
                               bucketed_exact_topk(q, k, K, block_q=bq,
                                                   block_r=br)), qs, keys)
            results[(bq, br)] = t
            print(f"bucket bq={bq:5d} br={br:5d}: {t*1e3:.3f} ms "
                  f"({t/t_approx:.2f}x approx)")
        except Exception as ex:  # noqa: BLE001 — config may not fit VMEM
            print(f"bucket bq={bq:5d} br={br:5d}: FAILED {ex}")
    best = min(results, key=results.get)
    print(f"best: bq={best[0]} br={best[1]} {results[best]*1e3:.3f} ms "
          f"= {results[best]/t_approx:.2f}x approx")


def sweep_subtile():
    """Phase-1 subtile interleave variant (MXU/VPU overlap attempt).

    Measured (v5e, same chip session): subtile {0, 512, 1024, 2048} →
    3.290 / 3.275 / 3.293 / 3.262 ms — within noise; see
    docs/KERNEL_NOTES.md. The default stays 0.
    """
    from ragraph_tpu.ops.bucket_topk import bucketed_exact_topk

    qs, keys = _setup()
    for sub in (0, 512, 1024, 2048):
        t = _timeit(_chain(lambda q, k, sub=sub: bucketed_exact_topk(
            q, k, K, block_q=2048, block_r=4096, subtile=sub)), qs, keys)
        print(f"subtile={sub:5d}: {t*1e3:.3f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "subtile":
        sweep_subtile()
    else:
        main()
