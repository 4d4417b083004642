"""Serving-latency benchmark: per-request inference latencies on TPU.

The reference has no serving story (its "serving" is `rating = U @ I^T`
inside eval, ``RAGraph_edge/modules/RAGraph.py:362``); this measures the
TPU-native request paths a deployment actually runs:

1. **edge recommend (hot path)** — :meth:`RAGraphEdge.recommend_from`:
   precomputed full-graph embeddings (refreshed once per model update),
   per request: gather B user rows -> (B, I) score matmul -> history
   mask -> top-k. Measured at B = 1 / 256 / 4096 over 128k items.
2. **edge embedding refresh** — one full ``generate`` (3-layer
   propagation over 2M directed edges + gating): the cost of a model
   refresh, amortized over every request until the next one.
3. **node-task inference** — the training-free RAGraph forward
   (encoder -> retrieval from a 262k library -> fusion -> decode) on a
   2048-node graph: per-batch classification latency.

Methodology matches bench.py (chain iterations inside one jit, pull one
scalar, subtract the measured tunnel roundtrip; the request chains feed
each iteration's output back into the next request's input so nothing is
dead-code-eliminated).

Measured (v5e single chip, r3):

  edge embedding refresh (128k x 128k, 2M edges, 3 layers)   24.4 ms
  recommend_from  B=1    over 131k items, k=20     0.036 ms  (28k req/s)
  recommend_from  B=256                            0.44 ms   (579k users/s)
  recommend_from  B=4096 (scatter mask)            8.49 ms   (482k users/s)
  recommend_from  B=4096 (hist_pad=64, rc=0.95)    3.35 ms   (1.22M users/s)
  node-task inference (2048 nodes, 262k library)   2.04 ms/batch

The scatter-masked B=4096 request is HBM-bound on the (B, I) f32 score
matrix: the history-mask scatter between the matmul and approx_max_k
forces the scores to materialize (2.1 GB at that shape). The fused
``hist_pad`` path (top-(k+pad) candidates straight out of the matmul
epilogue, history filtered among candidates) removes the
materialization: 2.5x faster at the same measured recall@20 vs the
exact masked sort (0.9954 both). Caveat discovered en route:
``approx_max_k``'s cost EXPLODES with k at high recall_target (k=84:
0.65 ms at 0.9 / 30.8 ms at 0.99, this shape) — candidate oversampling
must drop the recall target, which end-to-end quality tolerates
(boundary misses concentrate at the tail of the candidate window, not
in the final top-k).

Tail percentiles (VERDICT r3 #7): chip/link state swings latencies
1.9-2.4x across sessions, so single-session means oversell. Every arm
now records REPS chain repetitions per session and dumps the raw
samples to results/serving_sessions/session_<ts>.json; run the script
in >=3 separate sessions, then ``python benchmarks/serving_percentiles.py``
pools the session files into the p50/p99 table SERVING.md quotes.

Per-request tail latency in the dispatch-per-request sense is NOT
measurable through this environment's tunnel (the host<->device
roundtrip is ~1 ms and serializes before each tiny request); the
distribution captured here is chain-level — the on-chip per-iteration
cost under repeated capture, which is what the cross-session variance
actually moves. A dispatch-mode B=1 arm (async Python-driven dispatch,
with and without ``donate_argnums`` on the fed-back user buffer) is
recorded separately to quantify the dispatch ceiling and whether
donation helps the hot B=1 path.

Usage: python benchmarks/bench_serving.py   (real TPU)
"""

import json
import os
import time

import numpy as np

ITERS = 50
REPS = int(os.environ.get("SERVING_REPS", "10"))
DISPATCH_N = 200


def _roundtrip():
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.float32(1.0)
    for _ in range(3):
        float(f(x))
    t0 = time.perf_counter()
    float(f(x))
    return time.perf_counter() - t0


def _time_chain(fn, *args, roundtrip):
    """REPS samples of a jitted ITERS-chain, per-iteration seconds."""
    float(fn(*args))  # compile
    out = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        out.append(max((time.perf_counter() - t0 - roundtrip) / ITERS,
                       1e-9))
    return out


def _time_slope(make_chain, *args):
    """Per-iteration seconds as the slope between an ITERS and a 4*ITERS
    chain — for work faster than one tunnel roundtrip, where roundtrip
    subtraction clamps to zero (same trick as bench.py's node step).
    Returns REPS per-pair slope samples (each pair adjacent in time, so
    chip-state drift cancels within a sample)."""
    short, long_ = make_chain(ITERS), make_chain(4 * ITERS)
    float(short(*args))  # compile both lengths
    float(long_(*args))
    out = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(short(*args))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(long_(*args))
        tl = time.perf_counter() - t0
        out.append(max((tl - ts) / (3 * ITERS), 1e-9))
    return out


def bench_edge_serving(roundtrip):
    import jax
    import jax.numpy as jnp

    from ragraph_tpu.models.edge import (EdgeGraphArrays, EdgeModelConfig,
                                         RAGraphEdge)

    U = I = 1 << 17
    M, D = 1 << 20, 64
    rng = np.random.default_rng(1)
    u = rng.integers(0, U, M).astype(np.int32)
    it = rng.integers(0, I, M).astype(np.int32) + U
    send = np.concatenate([u, it])
    recv = np.concatenate([it, u])
    order = np.argsort(recv, kind="stable")
    send, recv = send[order], recv[order]
    deg = np.bincount(send, minlength=U + I).astype(np.float32)
    norm = (1.0 / np.sqrt(np.maximum(deg[send] * deg[recv],
                                     1.0))).astype(np.float32)
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(recv, minlength=U + I))]).astype(np.int32)
    # sender-order auxiliaries + static time norm: the refresh must run
    # the FUSED propagation (segsum_impl auto), same as bench.py's step
    perm = np.argsort(send, kind="stable").astype(np.int32)
    sip = np.concatenate(
        [[0], np.cumsum(np.bincount(send, minlength=U + I))]).astype(np.int32)
    tn = np.ones(2 * M, np.float32)
    tn /= np.maximum(np.bincount(recv, minlength=U + I), 1.0)[recv]
    g = EdgeGraphArrays(
        senders=jnp.asarray(send), receivers=jnp.asarray(recv),
        edge_norm=jnp.asarray(norm),
        edge_times=jnp.zeros(2 * M, jnp.float32),
        num_users=U, num_items=I, recv_indptr=jnp.asarray(indptr),
        send_perm=jnp.asarray(perm), send_indptr=jnp.asarray(sip),
        recv_of_send=jnp.asarray(recv[perm].astype(np.int32)),
        edge_norm_send=jnp.asarray(norm[perm]),
        time_norm=jnp.asarray(tn), time_norm_send=jnp.asarray(tn[perm]))
    cfg = EdgeModelConfig(emb_size=D, num_layers=3)
    model = RAGraphEdge(cfg, g, phase="pretrain")
    params = model.init_params(jax.random.key(0))

    # --- refresh cost: one full generate ---
    gen = jax.jit(lambda p: model.generate(p))
    ue, ie = gen(params)
    float(ue[0, 0])

    @jax.jit
    def gen_chain(p):
        def body(i, acc):
            ue, ie = model.generate(p)
            return acc + ue[0, 0] + ie[0, 0]
        return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

    float(gen_chain(params))
    refresh_ms = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(gen_chain(params))
        refresh_ms.append(
            max((time.perf_counter() - t0 - roundtrip) / 10, 1e-9) * 1e3)

    # --- request path at several batch sizes ---
    out = {}
    hist_cols = jnp.asarray(rng.integers(0, I, 32).astype(np.int32))
    for B in (1, 256, 4096):
        users0 = jnp.asarray(rng.integers(0, U, B).astype(np.int32))
        hist_rows = jnp.asarray(rng.integers(0, B, 32).astype(np.int32))

        def make_chain(iters):
            @jax.jit
            def req_chain(ue, ie, users):
                def body(i, carry):
                    us, acc = carry
                    s, idx = model.recommend_from(ue, ie, us, k=20,
                                                  hist_rows=hist_rows,
                                                  hist_cols=hist_cols)
                    # next request's users derive from this result (no DCE)
                    us = (us + idx[:, 0].astype(jnp.int32)) % U
                    return us, acc + s[0, 0]
                _, acc = jax.lax.fori_loop(0, iters, body,
                                           (users, jnp.float32(0)))
                return acc
            return req_chain

        # slope timing: the small-B requests are far faster than one
        # tunnel roundtrip, where plain subtraction clamps to zero
        out[B] = [s * 1e3 for s in _time_slope(make_chain, ue, ie, users0)]

    # fused candidate path at the HBM-bound shape: top-(k+pad) straight
    # out of the matmul epilogue, history filtered among candidates
    B = 4096
    users0 = jnp.asarray(rng.integers(0, U, B).astype(np.int32))
    hist_rows = jnp.asarray(rng.integers(0, B, 32).astype(np.int32))

    def make_fused(iters):
        @jax.jit
        def req_chain(ue, ie, users):
            def body(i, carry):
                us, acc = carry
                s, idx = model.recommend_from(ue, ie, us, k=20,
                                              hist_rows=hist_rows,
                                              hist_cols=hist_cols,
                                              hist_pad=64,
                                              recall_target=0.95)
                us = (us + idx[:, 0].astype(jnp.int32)) % U
                return us, acc + s[0, 0]
            _, acc = jax.lax.fori_loop(0, iters, body,
                                       (users, jnp.float32(0)))
            return acc
        return req_chain

    out["4096 fused"] = [s * 1e3
                         for s in _time_slope(make_fused, ue, ie, users0)]

    # --- dispatch-mode B=1: Python-driven async dispatch (the way a
    # real serving loop issues requests), with and without donating the
    # fed-back user buffer. Measures the per-request DISPATCH ceiling
    # (host-bound through this tunnel) and whether donate_argnums
    # measurably helps the hot B=1 path (VERDICT r3 #7).
    users1 = jnp.asarray(rng.integers(0, U, 1).astype(np.int32))
    hist_rows1 = jnp.zeros((32,), jnp.int32)

    def _step(ue, ie, us):
        s, idx = model.recommend_from(ue, ie, us, k=20,
                                      hist_rows=hist_rows1,
                                      hist_cols=hist_cols)
        return (idx[:, 0].astype(jnp.int32) + us) % U

    dispatch = {}
    for name, step in (
            ("plain", jax.jit(_step)),
            ("donate", jax.jit(_step, donate_argnums=(2,)))):
        us = jnp.array(users1, copy=True)
        us = step(ue, ie, us)           # compile
        us.block_until_ready()
        samples = []
        for _ in range(REPS):
            us_run = jnp.array(users1, copy=True)
            t0 = time.perf_counter()
            for _ in range(DISPATCH_N):
                us_run = step(ue, ie, us_run)
            us_run.block_until_ready()
            samples.append((time.perf_counter() - t0) / DISPATCH_N * 1e3)
        dispatch[name] = samples

    return refresh_ms, out, dispatch


def bench_node_inference(roundtrip):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ragraph_tpu.core.graph import DenseGraph, normalize_adj_dense
    from ragraph_tpu.models.ragraph_node import (RAGraphNode,
                                                 RAGraphNodeConfig)

    N, F, C, CAP = 2048, 256, 10, 262_144
    cfg = RAGraphNodeConfig(emb_size=256, num_class=C, finetune=False)
    model = RAGraphNode(cfg, F)
    state = model.init_state(jax.random.key(0), library_capacity=CAP)
    rng = np.random.default_rng(2)
    lib = dataclasses.replace(
        state.library,
        keys=jnp.asarray(rng.normal(size=(CAP + 1, 256)), jnp.float32),
        values=jnp.asarray(rng.normal(size=(CAP + 1, 256)), jnp.float32),
        labels=jnp.asarray(
            np.eye(C, dtype=np.float32)[rng.integers(0, C, CAP + 1)]),
        fill=jnp.asarray(CAP, jnp.int32))
    state = dataclasses.replace(state, library=lib)
    a = (rng.random((N, N)) < 0.01).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    graph = DenseGraph(
        features=jnp.asarray(rng.normal(size=(N, F)), jnp.float32),
        adj=normalize_adj_dense(jnp.asarray(a)),
        node_mask=jnp.ones((N,), bool),
        labels=jnp.asarray(np.eye(C, dtype=np.float32)[
            rng.integers(0, C, N)]),
        graph_ids=jnp.zeros((N,), jnp.int32),
        num_graphs=jnp.asarray(1, jnp.int32))

    @jax.jit
    def chain(state, graph):
        def body(i, carry):
            g, acc = carry
            logits = model.forward(state, g)
            g = dataclasses.replace(
                g, features=g.features + 1e-6 * logits[:, :1])
            return g, acc + logits[0, 0]
        _, acc = jax.lax.fori_loop(0, ITERS, body,
                                   (graph, jnp.float32(0)))
        return acc

    return [s * 1e3
            for s in _time_chain(chain, state, graph, roundtrip=roundtrip)]


def main():
    rt = _roundtrip()
    refresh_ms, req, dispatch = bench_edge_serving(rt)
    node_ms = bench_node_inference(rt)

    def stats(xs):
        return (f"min {min(xs):.3f} / p50 {float(np.percentile(xs, 50)):.3f}"
                f" / max {max(xs):.3f} ms")

    print(f"edge embedding refresh (128k x 128k users/items, 2M edges, "
          f"3 layers): {stats(refresh_ms)}")
    for b, ms in req.items():
        n = int(str(b).split()[0])
        print(f"edge recommend_from  B={b!s:<10} over 131k items, k=20: "
              f"{stats(ms)} ({n / min(ms) * 1e3:,.0f} users/s at best)")
    for name, ms in dispatch.items():
        print(f"dispatch-mode B=1 ({name}): {stats(ms)} per request "
              f"(host/tunnel-bound ceiling)")
    print(f"node-task inference (2048 nodes, 262k-row library, "
          f"training-free forward): {stats(node_ms)}")

    out = {
        "ts": time.time(), "iters": ITERS, "reps": REPS,
        "dispatch_n": DISPATCH_N, "roundtrip_ms": rt * 1e3,
        "arms": {
            "refresh_ms": refresh_ms,
            "B1_ms": req[1], "B256_ms": req[256], "B4096_ms": req[4096],
            "B4096_fused_ms": req["4096 fused"],
            "B1_dispatch_ms": dispatch["plain"],
            "B1_dispatch_donate_ms": dispatch["donate"],
            "node_ms": node_ms,
        },
    }
    os.makedirs("results/serving_sessions", exist_ok=True)
    path = f"results/serving_sessions/session_{int(time.time())}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"session samples written to {path}")


if __name__ == "__main__":
    main()
