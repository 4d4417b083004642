"""10M-vector retrieval: brute-force blocked matmul vs IVF coarse index.

North-star benchmark (BASELINE.md): at R=10M, E=128, compare the
brute-force TPU path (bf16 matmul + approx_max_k) against the IVF index
at equal recall@10. Everything (including key generation) stays on
device — the tunnel is too slow for multi-GB host transfers.

Measured (v5e single chip, R=10M, E=128, Q=256, k=10):
  brute force:  6.9 ms/batch (37k q/s), recall_target 0.99
  IVF (P=8192, cap=2560, nprobe=16): build 48 s, search 44.9 ms/batch,
  recall@10 vs brute = 0.827

CONCLUSION: on TPU the brute-force blocked matmul BEATS IVF-style coarse
indexing at this scale — dense MXU FLOPs outrun the random-access bucket
gathers (the (Q, nprobe, cap, E) gather is ~13x off HBM bandwidth as an
XLA gather). Brute force + approx_max_k is the production default; IVF
(or the ICI-sharded index in parallel/) becomes relevant only when keys
exceed single-chip HBM.

Usage: python benchmarks/bench_10m_index.py
"""

import time

import numpy as np

R, E, Q, K = 10_000_000, 128, 256, 10
CLUSTERS, CAP, NPROBE = 8192, 2560, 16


def main():
    import jax
    import jax.numpy as jnp
    from ragraph_tpu.ops.similarity import l2_normalize
    from ragraph_tpu.rag.ivf import build_ivf, ivf_search

    # clustered keys generated on device (cluster structure is what makes
    # IVF meaningful; pure-random keys have no recallable structure)
    n_gen_clusters = 1024

    @jax.jit
    def gen_keys(key):
        k1, k2, k3 = jax.random.split(key, 3)
        centers = jax.random.normal(k1, (n_gen_clusters, E)) * 2.0
        assign = jax.random.randint(k2, (R,), 0, n_gen_clusters)
        noise = jax.random.normal(k3, (R, E))
        return (centers[assign] + noise).astype(jnp.bfloat16)

    t0 = time.perf_counter()
    keys = gen_keys(jax.random.key(0))
    jax.block_until_ready(keys)
    print(f"generated {R:,} x {E} keys on device "
          f"({keys.nbytes/2**30:.2f} GiB) in {time.perf_counter()-t0:.1f}s")

    queries = jax.random.normal(jax.random.key(1), (Q, E)).astype(jnp.float32)

    # ---- brute force: bf16 matmul + approx_max_k ----
    @jax.jit
    def norm_bf16(kk):
        # normalize in chunks to avoid a full f32 copy
        def one(c):
            return l2_normalize(c.astype(jnp.float32)).astype(jnp.bfloat16)
        return jax.lax.map(one, kk.reshape(100, -1, E)).reshape(R, E)
    keys_n = norm_bf16(keys)
    jax.block_until_ready(keys_n)
    del keys

    @jax.jit
    def brute(q, kn):
        qn = l2_normalize(q).astype(jnp.bfloat16)
        scores = jnp.dot(qn, kn.T, preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(scores, K, recall_target=0.99)

    s, brute_ids = brute(queries, keys_n)
    jax.block_until_ready((s, brute_ids))
    iters = 10

    @jax.jit
    def brute_chain(q, kn):
        def body(_, carry):
            qq, acc = carry
            sv, _ = brute(qq, kn)
            return qq + 1e-6 * sv[:, :1], acc + sv[0, 0]
        return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))[1]

    float(brute_chain(queries, keys_n))
    t0 = time.perf_counter()
    float(brute_chain(queries, keys_n))
    brute_dt = (time.perf_counter() - t0) / iters
    print(f"brute force: {brute_dt*1e3:.1f} ms / {Q} queries "
          f"({Q/brute_dt:,.0f} q/s)")

    # ---- int8 tier: pre-quantized table + double-rate MXU scoring ----
    from ragraph_tpu.ops.topk import cosine_topk

    @jax.jit
    def quantize(kn):
        # chunked: the table is GiB-scale (int8 output halves it vs bf16)
        def one(c):
            return jnp.clip(jnp.round(c.astype(jnp.float32) * 127.0),
                            -127, 127).astype(jnp.int8)
        return jax.lax.map(one, kn.reshape(100, -1, E)).reshape(R, E)

    keys_i8 = quantize(keys_n)
    jax.block_until_ready(keys_i8)

    @jax.jit
    def brute_i8(q, ki):
        return cosine_topk(q, ki, K, method="approx", score_dtype="int8")

    s8, i8_ids = brute_i8(queries, keys_i8)
    jax.block_until_ready((s8, i8_ids))

    @jax.jit
    def i8_chain(q, ki):
        def body(_, carry):
            qq, acc = carry
            sv, _ = brute_i8(qq, ki)
            return qq + 1e-6 * sv[:, :1], acc + sv[0, 0]
        return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))[1]

    float(i8_chain(queries, keys_i8))
    t0 = time.perf_counter()
    float(i8_chain(queries, keys_i8))
    i8_dt = (time.perf_counter() - t0) / iters
    hit8 = (i8_ids[:, :, None] == brute_ids[:, None, :]).any(-1)
    i8_recall = float(hit8.mean())
    print(f"int8 tier: {i8_dt*1e3:.1f} ms / {Q} queries "
          f"({Q/i8_dt:,.0f} q/s, {brute_dt/i8_dt:.2f}x bf16; table "
          f"{keys_i8.nbytes/2**30:.2f} GiB vs {keys_n.nbytes/2**30:.2f}); "
          f"recall@{K} vs bf16+approx = {i8_recall:.4f}")

    # ---- int8 + exact candidate rescore (the serving-grade tier
    # docs/SERVING.md recommends; r4 verdict item 8: it had no number at
    # 10M) — int8 scores pick k+22 candidates, the bf16 table rescores
    # just those rows ----
    @jax.jit
    def brute_i8_rs(q, ki, kn):
        return cosine_topk(q, ki, K, method="approx", score_dtype="int8",
                           rescore_pad=22, rescore_keys=kn,
                           keys_normalized=True)

    s8r, i8rs_ids = brute_i8_rs(queries, keys_i8, keys_n)
    jax.block_until_ready((s8r, i8rs_ids))

    @jax.jit
    def i8rs_chain(q, ki, kn):
        def body(_, carry):
            qq, acc = carry
            sv, _ = brute_i8_rs(qq, ki, kn)
            return qq + 1e-6 * sv[:, :1], acc + sv[0, 0]
        return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))[1]

    float(i8rs_chain(queries, keys_i8, keys_n))
    t0 = time.perf_counter()
    float(i8rs_chain(queries, keys_i8, keys_n))
    i8rs_dt = (time.perf_counter() - t0) / iters
    hit8r = (i8rs_ids[:, :, None] == brute_ids[:, None, :]).any(-1)
    i8rs_recall = float(hit8r.mean())
    print(f"int8+rescore(pad=22): {i8rs_dt*1e3:.1f} ms / {Q} queries "
          f"({Q/i8rs_dt:,.0f} q/s, {brute_dt/i8rs_dt:.2f}x bf16); "
          f"recall@{K} vs bf16+approx = {i8rs_recall:.4f}")
    del keys_i8

    # ---- EXACT brute force: two-phase bucket kernel ----
    from ragraph_tpu.ops.bucket_topk import bucketed_exact_topk

    @jax.jit
    def exact(q, kn):
        qn = l2_normalize(q)
        return bucketed_exact_topk(qn, kn, K)

    s_e, exact_ids = exact(queries, keys_n)
    jax.block_until_ready((s_e, exact_ids))

    @jax.jit
    def exact_chain(q, kn):
        def body(_, carry):
            qq, acc = carry
            sv, _ = exact(qq, kn)
            return qq + 1e-6 * sv[:, :1], acc + sv[0, 0]
        return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))[1]

    float(exact_chain(queries, keys_n))
    t0 = time.perf_counter()
    float(exact_chain(queries, keys_n))
    exact_dt = (time.perf_counter() - t0) / iters
    # true recall of the approx path, measured against the exact kernel
    hit = (brute_ids[:, :, None] == exact_ids[:, None, :]).any(-1)
    print(f"exact bucket kernel: {exact_dt*1e3:.1f} ms / {Q} queries "
          f"({Q/exact_dt:,.0f} q/s); approx recall@{K} vs exact = "
          f"{float(hit.mean()):.4f}")

    # ---- IVF ----
    t0 = time.perf_counter()
    idx = build_ivf(keys_n, jax.random.key(2), num_clusters=CLUSTERS,
                    capacity=CAP, iters=5, normalized=True)
    jax.block_until_ready(idx.keys)
    build_dt = time.perf_counter() - t0
    dropped = int(idx.dropped)
    print(f"IVF build: {build_dt:.1f}s ({CLUSTERS} clusters, cap {CAP}, "
          f"dropped {dropped:,} rows = {dropped/R:.3%})")

    s2, ivf_ids = ivf_search(idx, queries, k=K, nprobe=NPROBE)
    jax.block_until_ready((s2, ivf_ids))

    @jax.jit
    def ivf_chain(index, q):
        # index passed as an ARGUMENT: closing over it would bake 5+ GB
        # of constants into the executable (and the compile request)
        def body(_, carry):
            qq, acc = carry
            sv, _ = ivf_search(index, qq, k=K, nprobe=NPROBE)
            return qq + 1e-6 * sv[:, :1], acc + sv[0, 0]
        return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))[1]

    float(ivf_chain(idx, queries))
    t0 = time.perf_counter()
    float(ivf_chain(idx, queries))
    ivf_dt = (time.perf_counter() - t0) / iters
    print(f"IVF search (nprobe={NPROBE}): {ivf_dt*1e3:.1f} ms / {Q} "
          f"queries ({Q/ivf_dt:,.0f} q/s)")

    # recall of IVF vs brute force, on device
    @jax.jit
    def recall(a, b):
        return (a[:, :, None] == b[:, None, :]).any(-1).mean()

    rec = float(recall(ivf_ids, brute_ids))
    print(f"IVF recall@{K} vs brute force: {rec:.4f}")
    print(f"speedup at that recall: {brute_dt/ivf_dt:.2f}x")

    import json
    import os
    hit_b = (brute_ids[:, :, None] == exact_ids[:, None, :]).any(-1)
    out = {"R": R, "E": E, "Q": Q, "k": K,
           "brute_ms": brute_dt * 1e3,
           "brute_recall_vs_exact": float(hit_b.mean()),
           "int8_ms": i8_dt * 1e3, "int8_recall_vs_bf16": i8_recall,
           "int8_rescore_ms": i8rs_dt * 1e3,
           "int8_rescore_recall_vs_bf16": i8rs_recall,
           "exact_ms": exact_dt * 1e3,
           "ivf_ms": ivf_dt * 1e3, "ivf_recall_vs_brute": rec,
           "ivf_build_s": build_dt}
    os.makedirs("results", exist_ok=True)
    with open("results/bench_10m_index.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
