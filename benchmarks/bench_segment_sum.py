"""Segment-sum strategy shootout for LightGCN propagation on TPU.

The edge models' hot op is `out[r] += emb[s] * w` over ~10^5-10^7 edges
(``models/edge/base.py::lightgcn_propagate``). XLA lowers
`jax.ops.segment_sum` to scatter-add, which serializes on duplicate
indices on TPU. Candidates:

  A. scatter-add (jax.ops.segment_sum)           — baseline
  B. sort-free cumsum-diff: with receivers pre-sorted (our datasets build
     them sorted by construction via CSR), out = cum[end]-cum[start]
  C. one-hot matmul (MXU) over receiver blocks    — turns the reduction
     into dense FLOPs

Measured (v5e, E=512k, N=128k, D=64): scatter 8.9 ms, cumsum-diff
7.9 ms — both ~25x off HBM bandwidth. A Pallas block-one-hot-matmul
kernel could close most of that gap for high-degree graphs, but at our
datasets' average degree (~2) the reduction is a minor share of step
time; deferred (see CLAUDE.md deferred list).

Run: python benchmarks/bench_segment_sum.py
"""

import time

import numpy as np

E_EDGES, N_NODES, D = 1 << 19, 1 << 17, 64
ITERS = 30


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    recv = np.sort(rng.integers(0, N_NODES, E_EDGES)).astype(np.int32)
    msgs = jnp.asarray(rng.normal(size=(E_EDGES, D)).astype(np.float32))
    recv_j = jnp.asarray(recv)

    # CSR boundaries for the cumsum-diff method
    indptr = np.zeros(N_NODES + 1, np.int64)
    np.add.at(indptr[1:], recv, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    starts = jnp.asarray(indptr[:-1])
    ends = jnp.asarray(indptr[1:])

    def timeit(name, fn, *args):
        c = jax.jit(fn).lower(*args).compile()
        out = c(*args)
        jax.block_until_ready(out)

        @jax.jit
        def chain(m):
            def body(_, carry):
                mm, acc = carry
                o = fn(mm, *args[1:])
                return mm + 1e-9 * o[:1].sum(), acc + o[0, 0]
            return jax.lax.fori_loop(0, ITERS, body,
                                     (m, jnp.float32(0)))[1]

        float(chain(args[0]))
        t0 = time.perf_counter()
        float(chain(args[0]))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)
        return c(*args)

    def scatter(m, r):
        return jax.ops.segment_sum(m, r, num_segments=N_NODES)

    def cumsum_diff(m, s, e):
        cum = jnp.cumsum(m, axis=0)
        cum = jnp.concatenate([jnp.zeros((1, D), m.dtype), cum], axis=0)
        return cum[e] - cum[s]

    a = timeit("A scatter-add   ", scatter, msgs, recv_j)
    b = timeit("B cumsum-diff   ", cumsum_diff, msgs, starts, ends)

    err = float(jnp.abs(a - b).max())
    rel = err / float(jnp.abs(a).max())
    print(f"max abs diff A vs B: {err:.5f} (rel {rel:.2e}; cumsum is a "
          f"different f32 summation order)")


if __name__ == "__main__":
    main()
