"""Library-build throughput: TPU vmapped pipeline vs reference-style CPU.

The reference builds its toy-graph library one graph at a time in Python
(``RAGraph_node/ragraph_utils/ToyGraphBase.py:40-45``): per graph+copy it
runs a dense PageRank power iteration, augmentation, frozen-encoder
inference, k-hop value propagation, and an O(N³) Floyd–Warshall for
position codes. Here the whole per-graph pipeline is ONE jitted vmap over
a stacked batch (``rag/library.py::build_entries_batch``).

CPU baseline: a faithful NumPy reimplementation of the per-graph math
(same augment/sampling/pagerank/floyd-warshall steps), looped.

Usage: python benchmarks/bench_library_build.py  (runs on the live TPU)
"""

import time

import numpy as np


B, N, F, C, HID = 128, 32, 16, 3, 64
AUG, SAMPLES, ANCHORS, DISQ, HOP = 3, 10, 10, 10, 2


def make_batch(rng):
    feats = rng.normal(size=(B, N, F)).astype(np.float32)
    adj = (rng.random((B, N, N)) < 0.2).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    labels = np.eye(C, dtype=np.float32)[rng.integers(0, C, (B, N))]
    return feats, adj, labels


def bench_tpu():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from ragraph_tpu.core.graph import normalize_adj_dense
    from ragraph_tpu.rag.library import LibraryConfig, build_entries_batch

    rng = np.random.default_rng(0)
    feats, adj, labels = make_batch(rng)
    w = jax.random.normal(jax.random.key(0), (F, HID)) * 0.1

    def encoder(f, a, mask=None):
        return jnp.tanh(a @ (f @ w))

    cfg = LibraryConfig(level="node", num_inverse_sample=SAMPLES,
                        num_augment_scale=AUG, use_positions=True,
                        num_anchors=ANCHORS, dis_q=DISQ, toy_graph_hop=HOP)
    build = jax.jit(partial(build_entries_batch, encoder, cfg=cfg))

    adj_n = jax.vmap(normalize_adj_dense)(jnp.asarray(adj))
    args = (jnp.asarray(feats), adj_n, jnp.asarray(labels),
            jnp.ones((B, N), bool), jnp.zeros((B, C)))

    out = build(*args, key=jax.random.key(1))
    jax.block_until_ready(out)
    # async-pipelined, matching build_library semantics: batches are
    # dispatched back-to-back and appended on device; one final sync
    iters = 40
    t0 = time.perf_counter()
    outs = [build(*args, key=jax.random.key(i)) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    return B / dt, dt


def bench_cpu_reference():
    """Reference-math per-graph loop in NumPy (pagerank + O(N^3) FW)."""
    rng = np.random.default_rng(0)
    feats, adj, labels = make_batch(rng)
    w = rng.normal(size=(F, HID)).astype(np.float32) * 0.1

    def pagerank(a, d=0.85, eps=1e-6):
        n = a.shape[0]
        out_deg = a.sum(1)
        zero = out_deg == 0
        out_deg[zero] = 1
        p_mat = a / out_deg[:, None]
        p_mat[zero] = 1.0 / n
        p = np.ones(n) / n
        for _ in range(200):
            new_p = (1 - d) / n + d * (p_mat.T @ p)
            if np.abs(new_p - p).sum() < eps:
                break
            p = new_p
        return p

    def floyd_warshall(a):
        n = a.shape[0]
        dist = np.where(a > 0, a, np.inf)
        np.fill_diagonal(dist, 0)
        for kk in range(n):
            dist = np.minimum(dist, dist[:, kk:kk + 1] + dist[kk:kk + 1, :])
        return dist

    def one_graph(f, a, y):
        deg = a.sum(1)
        dc = a.sum(0) / max(a.shape[0] - 1, 1)
        pr = pagerank(a.copy())
        imp = 0.5 * pr + 0.5 * dc
        prob = 1.0 / (imp + 1e-6)
        prob = prob / prob.sum()
        out = []
        for copy in range(1 + AUG):
            if copy > 0:
                fa = f + 0.1 * rng.normal(size=f.shape).astype(np.float32)
                keep = rng.random(f.shape[0]) < prob * 0.01
                fa = fa * keep[:, None]
                keep_p = (prob[:, None] + prob[None, :]) / 2
                aa = (rng.random(a.shape) < keep_p).astype(np.float32)
            else:
                fa, aa = f, a
            emb = np.tanh(aa @ (fa @ w))
            idx = rng.choice(f.shape[0], size=SAMPLES, p=prob)
            keys = emb[idx]
            keys = keys / np.maximum(
                np.linalg.norm(keys, axis=1, keepdims=True), 1e-12)
            sub = a[np.ix_(idx, idx)]
            vals = keys.copy()
            rowsum = sub.sum(1, keepdims=True)
            sub_n = np.divide(sub, rowsum, out=np.zeros_like(sub),
                              where=rowsum > 0)
            for _ in range(HOP):
                vals = np.maximum(sub_n @ vals, 0)
            dist = floyd_warshall(sub)
            anchors = rng.integers(0, SAMPLES, ANCHORS)
            d2a = dist[:, anchors]
            codes = np.where(d2a < DISQ, 1.0 / (d2a + 1.0), 0.0)
            out.append((keys, vals, y[idx], codes))
        return out

    t0 = time.perf_counter()
    for g in range(B):
        one_graph(feats[g], adj[g], labels[g])
    dt = time.perf_counter() - t0
    return B / dt, dt


def main():
    tpu_gps, tpu_dt = bench_tpu()
    cpu_gps, cpu_dt = bench_cpu_reference()
    print(f"TPU vmapped build: {tpu_gps:,.1f} graphs/s "
          f"({tpu_dt*1e3:.1f} ms / {B}-graph batch, "
          f"{(1+AUG)} copies x {SAMPLES} samples each)")
    print(f"CPU reference loop: {cpu_gps:,.1f} graphs/s")
    print(f"speedup: {tpu_gps / cpu_gps:,.1f}x")


if __name__ == "__main__":
    main()
