"""Int8-scored retrieval probe: can the v5e's 2x int8 MXU rate beat the
bf16 scoring path at the headline retrieval shape?

Hypothesis: keys and queries are L2-normalized (entries in [-1, 1]), so a
symmetric uniform quantization to int8 (scale 127) has absolute step
1/127 ~= 0.0079 — the same order as bf16's relative 2^-8 on near-unit
values — while the s8 x s8 -> s32 dot runs at 394 TOPS vs 197 TFLOP/s
bf16 on v5e. Per-query ranking is invariant to the (positive, uniform)
scale, so scores can feed ``lax.approx_max_k`` after one fused
int32 -> f32 convert.

Measures, on the real chip, at bench.py's shape (R=262144, E=128,
Q=2048, k=10):
  1. raw dot ms: bf16 vs int8 (chained, MXU-rate check);
  2. end-to-end retrieve chain ms: bf16+approx vs int8+approx
     (quantizing queries per call) vs int8 with pre-quantized queries;
  3. recall@10 vs the f32 exact sort for each arm.

Run: python experiments/int8_retrieval_bench.py  (real TPU; ~2 min)
"""

import time

import numpy as np

R, E, Q, K = 262_144, 128, 2048, 10
# the tunnel roundtrip can reach ~30 ms; chain enough iterations that the
# subtraction noise is <2% of the total
ITERS = 200


def main():
    import jax
    import jax.numpy as jnp
    from ragraph_tpu.ops.similarity import l2_normalize

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.normal(size=(R, E)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(Q, E)).astype(np.float32))
    keys_n = l2_normalize(keys)
    keys_bf = keys_n.astype(jnp.bfloat16)
    keys_i8 = jnp.clip(jnp.round(keys_n * 127.0), -127, 127).astype(jnp.int8)

    def quant_q(q):
        qn = l2_normalize(q)
        return jnp.clip(jnp.round(qn * 127.0), -127, 127).astype(jnp.int8)

    # --- roundtrip ---
    f = jax.jit(lambda x: x * 2.0)
    for _ in range(3):
        float(f(jnp.float32(1.0)))
    t0 = time.perf_counter()
    float(f(jnp.float32(1.0)))
    roundtrip = time.perf_counter() - t0
    print(f"roundtrip {roundtrip*1e3:.2f} ms")

    def timed_chain(fn, *args):
        c = jax.jit(fn)
        float(c(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(c(*args))
            ts.append(time.perf_counter() - t0)
        return max((min(ts) - roundtrip) / ITERS, 1e-9)

    # --- 1. raw dot rate ---
    # NB: the accumulator must consume the WHOLE score matrix — feeding
    # back one column lets XLA push the slice into the dot and compute a
    # (Q, 1) matmul instead (first run measured "0.000 ms").
    def dot_bf_chain(q, kn):
        qb = q.astype(jnp.bfloat16)

        def body(_, c):
            cc, acc = c
            s = jnp.dot(cc, kn.T, preferred_element_type=jnp.float32)
            m = jnp.max(s)
            return (qb + 1e-6 * m).astype(jnp.bfloat16), acc + m
        return jax.lax.fori_loop(0, ITERS, body, (qb, jnp.float32(0)))[1]

    def dot_i8_chain(qi, ki):
        def body(_, c):
            cc, acc = c
            s = jnp.dot(cc, ki.T, preferred_element_type=jnp.int32)
            m = jnp.max(s)
            return (jnp.clip(qi + (m & 1).astype(jnp.int8), -127, 127),
                    acc + m)
        return jax.lax.fori_loop(
            0, ITERS, body, (qi, jnp.int32(0)))[1].astype(jnp.float32)

    dt_bf = timed_chain(dot_bf_chain, l2_normalize(queries), keys_bf)
    dt_i8 = timed_chain(dot_i8_chain, quant_q(queries), keys_i8)
    flops = 2.0 * Q * R * E
    print(f"raw dot: bf16 {dt_bf*1e3:.3f} ms ({flops/dt_bf/1e12:.1f} TFLOP/s)"
          f" | int8 {dt_i8*1e3:.3f} ms ({flops/dt_i8/1e12:.1f} TOP/s)"
          f" -> int8 is {dt_bf/dt_i8:.2f}x")

    # --- 2. end-to-end retrieve chain ---
    def retrieve_bf(q, kn):
        qn = l2_normalize(q).astype(jnp.bfloat16)
        s = jnp.dot(qn, kn.T, preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s, K, recall_target=0.99)

    def retrieve_i8(q, ki):
        qi = quant_q(q)
        s = jnp.dot(qi, ki.T, preferred_element_type=jnp.int32)
        # positive uniform scale: ranking-invariant; convert fuses into
        # the PartialReduce consumer
        sf = s.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
        return jax.lax.approx_max_k(sf, K, recall_target=0.99)

    def chain_of(ret, q0, kk):
        def chain(q, kkk):
            def body(_, c):
                qq, acc = c
                s, _ = ret(qq, kkk)
                return qq + 1e-6 * s[:, :1], acc + s[0, 0]
            return jax.lax.fori_loop(0, ITERS, body,
                                     (q, jnp.float32(0)))[1]
        return timed_chain(chain, q0, kk)

    # --- 2b. two-stage: int8 coarse top-PAD + exact f32 rescore ---
    # approx_max_k cost explodes with k at high recall_target
    # (KERNEL_NOTES cost model), so the widened candidate fetch drops to
    # 0.9 — misses concentrate at the tail of the candidate window, not
    # in the final top-k.
    PAD = 32

    def make_two_stage(pad, rc, f32_rescore=False):
        def retrieve_2s(q, ki_kn):
            ki, kn = ki_kn
            qn = l2_normalize(q)
            qi = jnp.clip(jnp.round(qn * 127.0), -127, 127).astype(jnp.int8)
            s = jnp.dot(qi, ki.T, preferred_element_type=jnp.int32)
            _, cand = jax.lax.approx_max_k(
                s.astype(jnp.float32), pad, recall_target=rc)
            rows = kn[cand]                              # (Q, pad, E)
            if f32_rescore:
                sc = jnp.einsum("qe,qpe->qp", qn,
                                rows.astype(jnp.float32),
                                preferred_element_type=jnp.float32)
            else:
                sc = jnp.einsum("qe,qpe->qp", qn.astype(jnp.bfloat16), rows,
                                preferred_element_type=jnp.float32)
            v, p = jax.lax.top_k(sc, K)
            return v, jnp.take_along_axis(cand, p, axis=1)
        return retrieve_2s

    retrieve_2s = make_two_stage(PAD, 0.9)
    dt_ret_bf = chain_of(retrieve_bf, queries, keys_bf)
    dt_ret_i8 = chain_of(retrieve_i8, queries, keys_i8)
    dt_ret_2s = chain_of(retrieve_2s, queries, (keys_i8, keys_bf))
    print(f"retrieve chain: bf16 {dt_ret_bf*1e3:.3f} ms "
          f"({Q/dt_ret_bf:,.0f} q/s) | int8 {dt_ret_i8*1e3:.3f} ms "
          f"({Q/dt_ret_i8:,.0f} q/s) -> {dt_ret_bf/dt_ret_i8:.2f}x | "
          f"int8+rescore(pad={PAD}) {dt_ret_2s*1e3:.3f} ms "
          f"({Q/dt_ret_2s:,.0f} q/s) -> {dt_ret_bf/dt_ret_2s:.2f}x")

    # --- 3. recall vs f32 exact (on device, scalars back) ---
    @jax.jit
    def recall_pair(q, kn, ki, kf):
        s_ex = jnp.dot(l2_normalize(q), l2_normalize(kf).T,
                       preferred_element_type=jnp.float32)
        _, idx_ex = jax.lax.top_k(s_ex, K)
        _, idx_bf = retrieve_bf(q, kn)
        _, idx_i8 = retrieve_i8(q, ki)
        _, idx_2s = retrieve_2s(q, (ki, kn))
        hit_bf = (idx_bf[:, :, None] == idx_ex[:, None, :]).any(-1).mean()
        hit_i8 = (idx_i8[:, :, None] == idx_ex[:, None, :]).any(-1).mean()
        hit_2s = (idx_2s[:, :, None] == idx_ex[:, None, :]).any(-1).mean()
        return hit_bf, hit_i8, hit_2s

    r_bf, r_i8, r_2s = recall_pair(queries, keys_bf, keys_i8, keys)
    print(f"recall@{K} vs f32 exact: bf16+approx {float(r_bf):.4f} | "
          f"int8+approx {float(r_i8):.4f} | "
          f"int8+rescore {float(r_2s):.4f}")

    # --- 4. sweep (pad, recall_target, rescore dtype) ---
    exact_idx = jax.jit(lambda q, kf: jax.lax.top_k(
        jnp.dot(l2_normalize(q), l2_normalize(kf).T,
                preferred_element_type=jnp.float32), K)[1])(queries, keys)

    for pad, rc, f32r in [(32, 0.9, True), (32, 0.95, False),
                          (64, 0.9, False), (64, 0.9, True),
                          (64, 0.95, False)]:
        ret = make_two_stage(pad, rc, f32r)
        dt = chain_of(ret, queries, (keys_i8, keys_bf))

        @jax.jit
        def rec(q, ki, kn, ie):
            _, idx = ret(q, (ki, kn))
            return (idx[:, :, None] == ie[:, None, :]).any(-1).mean()
        r = float(rec(queries, keys_i8, keys_bf, exact_idx))
        print(f"  pad={pad} rc={rc} f32_rescore={f32r}: {dt*1e3:.3f} ms "
              f"({Q/dt:,.0f} q/s, {dt_ret_bf/dt:.2f}x bf16) "
              f"recall@{K}={r:.4f}")


if __name__ == "__main__":
    main()
