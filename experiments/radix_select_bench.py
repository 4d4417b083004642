"""Radix-width study for rowwise_kth_largest (exact k-th selection).

The huge-k RAG fusion's selection op streams the (Q, R) score matrix
once per radix pass. Cost model at (256, 442368) f32 on v5e
(~819 GB/s HBM):

  radix-2 (1 bit/pass):  32 passes x 453 MB = 14.5 GB -> 17.7 ms ideal
  radix-4 (2 bits/pass): 16 passes          =  7.2 GB ->  8.9 ms ideal
  radix-8 (3 bits/pass): 11 passes          =  5.0 GB ->  6.1 ms ideal

Measured (this file, v5e, 2026-08-18):
  radix-2 23.30 ms (76% of ideal)  radix-4 13.97 ms (64%)
  radix-8 10.73 ms (57%)           split-16 11.94 ms

radix-8 trades 7 compare+count streams per pass for 5 fewer passes —
a 1.30x win over radix-4: the extra VPU compares are free next to the
memory stream, so pass count rules. The split-16 variant (precomputed
uint16 high-half for the first 8 radix-4 passes = half the bytes,
full key for the low half) loses to radix-8: its extra HBM pass to
materialize key_hi eats the bandwidth it saves. **radix-8 is the
production implementation** (ops/selection.py); radix-4 is kept here
for the comparison.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ragraph_tpu.ops.selection import rowwise_kth_largest as kth_radix8_prod


def _keys(x):
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jnp.where((u >> 31) != 0, ~u, u | jnp.uint32(0x80000000))


def _back(lo):
    back = jnp.where(lo >= jnp.uint32(0x80000000),
                     lo & jnp.uint32(0x7FFFFFFF), ~lo)
    return jax.lax.bitcast_convert_type(back, jnp.float32)


@partial(jax.jit, static_argnames=("k",))
def kth_radix4(x, k):
    """2 bits per pass: 16 passes (the pre-study production op)."""
    q_len, r_len = x.shape
    k = max(1, min(k, r_len))
    key = _keys(x)

    def body(i, lo):
        b_hi = jnp.uint32(1) << (jnp.uint32(31) - 2 * i.astype(jnp.uint32))
        b_lo = b_hi >> 1
        c01 = lo | b_lo
        c10 = lo | b_hi
        c11 = lo | b_hi | b_lo
        n01 = (key >= c01).sum(axis=1, keepdims=True)
        n10 = (key >= c10).sum(axis=1, keepdims=True)
        n11 = (key >= c11).sum(axis=1, keepdims=True)
        return jnp.where(n11 >= k, c11,
                         jnp.where(n10 >= k, c10,
                                   jnp.where(n01 >= k, c01, lo)))

    lo = jax.lax.fori_loop(0, 16, body,
                           jnp.zeros((q_len, 1), jnp.uint32))
    return _back(lo)


@partial(jax.jit, static_argnames=("k",))
def kth_split16(x, k):
    """Radix-4 on a precomputed uint16 high-half (8 passes at half
    bandwidth), then radix-4 on the low 16 bits with the equality
    predicate on the (now fixed) high half."""
    q_len, r_len = x.shape
    k = max(1, min(k, r_len))
    key = _keys(x)
    key_hi = (key >> 16).astype(jnp.uint16)

    def body_hi(i, lo):
        b_hi = jnp.uint16(1) << (jnp.uint16(15) - 2 * i.astype(jnp.uint16))
        b_lo = b_hi >> 1
        c01 = lo | b_lo
        c10 = lo | b_hi
        c11 = lo | b_hi | b_lo
        n01 = (key_hi >= c01).sum(axis=1, keepdims=True)
        n10 = (key_hi >= c10).sum(axis=1, keepdims=True)
        n11 = (key_hi >= c11).sum(axis=1, keepdims=True)
        return jnp.where(n11 >= k, c11,
                         jnp.where(n10 >= k, c10,
                                   jnp.where(n01 >= k, c01, lo)))

    hi = jax.lax.fori_loop(0, 8, body_hi,
                           jnp.zeros((q_len, 1), jnp.uint16))
    hi32 = hi.astype(jnp.uint32) << 16

    def body_lo(i, lo):
        b_hi = jnp.uint32(1) << (jnp.uint32(15) - 2 * i.astype(jnp.uint32))
        b_lo = b_hi >> 1
        c01 = lo | b_lo
        c10 = lo | b_hi
        c11 = lo | b_hi | b_lo
        n01 = (key >= (hi32 | c01)).sum(axis=1, keepdims=True)
        n10 = (key >= (hi32 | c10)).sum(axis=1, keepdims=True)
        n11 = (key >= (hi32 | c11)).sum(axis=1, keepdims=True)
        return jnp.where(n11 >= k, c11,
                         jnp.where(n10 >= k, c10,
                                   jnp.where(n01 >= k, c01, lo)))

    lo = jax.lax.fori_loop(0, 8, body_lo,
                           jnp.zeros((q_len, 1), jnp.uint32))
    return _back(hi32 | lo)


def timeit(fn, x, k, iters=10):
    r = fn(x, k); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(x, k)
    r.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices())
    Q, R, K = 256, 442368, 100000
    x = jax.random.normal(jax.random.PRNGKey(0), (Q, R), jnp.float32)
    ref = kth_radix4(x, K)
    for name, fn in [("radix8", kth_radix8_prod), ("split16", kth_split16)]:
        got = fn(x, K)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=name)
    rows = []
    for name, fn in [("radix4", kth_radix4), ("radix8", kth_radix8_prod),
                     ("split16", kth_split16)]:
        dt = timeit(fn, x, K)
        rows.append((name, dt))
        print(f"{name:8s} {dt:7.2f} ms")
    best = min(rows, key=lambda r: r[1])
    print(f"best: {best[0]} at {best[1]:.2f} ms")

    # bf16 selection tier (EdgeModelConfig.selection_dtype="bf16"):
    # native 16-bit keys -> 6 half-width passes. Exact on the bf16
    # multiset (verified vs the sort); the caller's approximation is
    # rounding scores to bf16 before selecting.
    x_b = x.astype(jnp.bfloat16)
    got_b = kth_radix8_prod(x_b, K)
    ref_b = jax.lax.top_k(x_b.astype(jnp.float32), K)[0][:, -1:]
    np.testing.assert_array_equal(
        np.asarray(got_b.astype(jnp.float32)), np.asarray(ref_b),
        err_msg="bf16 tier")
    dt_b = timeit(kth_radix8_prod, x_b, K)
    print(f"radix8-bf16 {dt_b:7.2f} ms ({best[1]/dt_b:.2f}x vs f32 best)")


if __name__ == "__main__":
    main()
