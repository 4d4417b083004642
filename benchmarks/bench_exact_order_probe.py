"""Order probe: bench.py's exact latency & throughput arms, both orders.
If the SECOND arm is slower regardless of which it is, the repeated
sustained>latency gap is an order/chip-state effect, not structure."""
import time
import numpy as np
import jax, jax.numpy as jnp
from ragraph_tpu.ops.bucket_topk import bucketed_exact_topk
from ragraph_tpu.ops.similarity import l2_normalize

R, E, Q, K, ITERS = 262144, 128, 2048, 10, 30
rng = np.random.default_rng(4)
keys_n = l2_normalize(jnp.asarray(rng.normal(size=(R, E)).astype(np.float32))).astype(jnp.bfloat16)
queries = jnp.asarray(rng.normal(size=(Q, E)).astype(np.float32))
q_n = l2_normalize(queries).astype(jnp.bfloat16)

@jax.jit
def chain_lat(q, kn):
    def body(_, carry):
        qq, acc = carry
        s, _ = bucketed_exact_topk(l2_normalize(qq).astype(jnp.bfloat16), kn, K)
        return qq + 1e-6 * s[:, :1], acc + s[0, 0]
    return jax.lax.fori_loop(0, ITERS, body, (q, jnp.float32(0)))[1]

@jax.jit
def chain_tp(q, kn):
    def body(i, acc):
        qi = q + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
        s, _ = bucketed_exact_topk(qi, kn, K)
        return acc + s[0, 0]
    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

def t(fn, *a):
    float(fn(*a))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); float(fn(*a)); best = min(best, time.perf_counter()-t0)
    return best / ITERS * 1e3

# compile both first so compile order can't matter
float(chain_lat(queries, keys_n)); float(chain_tp(q_n, keys_n))
for trial in range(3):
    a = t(chain_lat, queries, keys_n); b = t(chain_tp, q_n, keys_n)
    c = t(chain_tp, q_n, keys_n);      d = t(chain_lat, queries, keys_n)
    print(f"trial {trial}: lat-first: lat={a:.3f} tp={b:.3f} | tp-first: tp={c:.3f} lat={d:.3f}", flush=True)
