"""Exact fused top-k kernel vs approx_max_k vs XLA sort on TPU.

The VERDICT r1 target: exact fused top-k within ~2x of ``approx_max_k`` at
R=262k / Q=2048 / k=10 (<= ~2.5 ms). Compares the merge strategies.

Run: python benchmarks/bench_pallas_topk.py
"""

import time

import numpy as np

R, E, Q, K = 262_144, 128, 2048, 10
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from ragraph_tpu.ops.pallas_retrieval import fused_cosine_topk
    from ragraph_tpu.ops.similarity import l2_normalize

    rng = np.random.default_rng(0)
    q = l2_normalize(jnp.asarray(rng.normal(size=(Q, E)).astype(np.float32)))
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(R, E)).astype(np.float32)))

    def chain(fn):
        @jax.jit
        def run(q, keys):
            def body(_, carry):
                qq, acc = carry
                s, i = fn(qq, keys)
                return qq + 1e-6 * s[:, :1], acc + s[0, 0]
            return jax.lax.fori_loop(0, ITERS, body, (q, jnp.float32(0)))[1]
        return run

    def timeit(name, fn):
        run = chain(fn)
        float(run(q, keys))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(q, keys))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / ITERS
        print(f"{name}: {dt*1e3:.3f} ms/batch")
        return dt

    def approx(qq, kk):
        scores = jnp.dot(qq.astype(jnp.bfloat16), kk.astype(jnp.bfloat16).T,
                         preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(scores, K, recall_target=0.99)

    from ragraph_tpu.ops.bucket_topk import bucketed_exact_topk

    timeit("approx_max_k (0.99)", approx)
    timeit("bucketed exact (two-phase)",
           lambda qq, kk: bucketed_exact_topk(qq, kk, K))
    for merge in ("insert", "rebuild"):
        timeit(f"pallas exact ({merge})",
               lambda qq, kk, m=merge: fused_cosine_topk(qq, kk, K, merge=m))

    # correctness on-device: two-phase output == full sort, bitwise
    s_p, i_p = bucketed_exact_topk(q, keys, K)
    scores = jnp.dot(q.astype(jnp.bfloat16), keys.astype(jnp.bfloat16).T,
                     preferred_element_type=jnp.float32)
    s_x, i_x = jax.lax.top_k(scores, K)
    match = float((i_p == i_x).mean())
    sdiff = float(jnp.abs(s_p - s_x).max())
    print(f"bucketed vs XLA sort: index match {match:.6f}, "
          f"max |score diff| {sdiff:.2e}")


if __name__ == "__main__":
    main()
