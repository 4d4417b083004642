"""Headline benchmark: batched cosine top-k retrieval throughput on TPU
vs the reference's brute-force PyTorch-CPU retrieval.

Workload (mirrors ``ToyGraphBase.retrieve`` /
``RAGraph_edge/modules/RAGraph.py:298-324`` at production scale): Q queries
against an R-row key library, E-dim, top-k — normalize, (Q,E)x(E,R) score
matmul, top-k, value gather.

Methodology notes for the tunneled single-chip setup: device→host
transfers through the tunnel are extremely slow, so (a) the bf16-vs-f32
recall check runs entirely on device (one scalar comes back), and (b)
timing chains ITERS executions with one final scalar sync and subtracts
the measured tunnel roundtrip.

Besides throughput, reports **MFU** (achieved FLOP/s over the chip's bf16
peak) for the retrieval matmul and for one edge-family train step at
amazon-like scale — the objective perf yardstick, since the reference has
no TPU numbers to beat (BASELINE.md).

Prints ONE JSON line:
  {"metric": "retrieval_qps", "value": <TPU queries/s>,
   "unit": "queries/s", "vs_baseline": <speedup vs torch-CPU>,
   "mfu": <retrieval MFU>, "exact_retrieval_ms": ...,
   "exact_vs_approx": ..., "exact_throughput_ms": ...,
   "exact_tp_vs_approx": ...,
   "int8_retrieval_qps": ..., "int8_recall": ...,
   "int8_rescore_qps": ..., "int8_rescore_recall": ...,
   "edge_step_ms": ..., "edge_step_bw_util": ...,
   "library_build_gps": ..., "node_step_ms": ...,
   "selection_kth_ms": ..., "selection_vs_sort": ...,
   "serving_users_per_s": ...,
   "probe_tflops": ..., "probe_tflops_post": ..., "degraded": bool}
"""

import json
import sys
import time

import numpy as np

R, E, Q, K = 262_144, 128, 2048, 10
WARMUP, ITERS = 3, 50
EDGE_ITERS = 20
NODE_ITERS = 20

# Calibration (VERDICT r2 #1): the round-2 driver capture ran during a
# degraded chip/tunnel state and recorded numbers 28x below the code's
# real performance, with nothing in bench.py to notice. Before (and
# after) timing anything we run a fixed 8k x 8k bf16 matmul chain with a
# known cost; if achieved TFLOP/s is far below the chip's expectation we
# back off and retry, and if it never recovers the JSON self-identifies
# with "degraded": true plus the probe's number.
PROBE_N, PROBE_CHAIN = 8192, 8
PROBE_MIN_FRACTION = 0.25   # healthy ~0.65 of peak; r2's bad capture ~0.02
PROBE_BACKOFFS = (30, 60, 120, 240)  # seconds between retries

# dense bf16 peak FLOP/s and HBM bandwidth by device_kind substring
# (public TPU specs)
_PEAKS = (("v6", 918e12, 1640e9), ("v5p", 459e12, 2765e9),
          ("v5", 197e12, 819e9), ("v4", 275e12, 1228e9),
          ("v3", 123e12, 900e9), ("v2", 45e12, 700e9))


def chip_peaks():
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for sub, flops, bw in _PEAKS:
        if sub in kind:
            return flops, bw
    return None, None


def compiled_costs(fn, *args):
    """XLA's (flops, bytes accessed) for one call (None if unavailable)."""
    try:
        import jax
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if not ca:
            return None, None
        f = ca.get("flops")
        b = ca.get("bytes accessed")
        return (float(f) if f and f > 0 else None,
                float(b) if b and b > 0 else None)
    except Exception:
        return None, None


def calibration_probe(roundtrip: float) -> float:
    """Achieved TFLOP/s on a fixed 8k x 8k bf16 matmul chain.

    The probe is pure MXU work with a known FLOP count, so its achieved
    rate is a direct health check of the chip + tunnel independent of any
    framework code being benchmarked.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.full((PROBE_N, PROBE_N), 0.5, jnp.bfloat16)
    w = jnp.full((PROBE_N, PROBE_N), 2.0 / PROBE_N, jnp.bfloat16)

    @jax.jit
    def chain(x, w):
        def body(_, c):
            # row-stochastic-ish w keeps values ~0.5 forever: finite, and
            # each iteration depends on the previous (no DCE).
            y = jnp.dot(c, w, preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, PROBE_CHAIN, body, x)[0, 0]

    float(chain(x, w))  # compile
    totals = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(chain(x, w))
        totals.append(time.perf_counter() - t0)
    dt = max(min(totals) - roundtrip, 1e-9)
    return PROBE_CHAIN * 2.0 * PROBE_N**3 / dt / 1e12


def wait_until_healthy(roundtrip: float, peak: float | None):
    """Probe; if degraded, back off and retry (the tunnel recovers).

    Returns (probe_tflops, degraded).
    """
    floor = (PROBE_MIN_FRACTION * peak / 1e12) if peak else 20.0
    tf = calibration_probe(roundtrip)
    for backoff in PROBE_BACKOFFS:
        if tf >= floor:
            return tf, False
        print(f"# calibration probe {tf:.1f} TFLOP/s < floor {floor:.1f} "
              f"— chip/tunnel degraded, retrying in {backoff}s",
              file=sys.stderr)
        time.sleep(backoff)
        tf = calibration_probe(roundtrip)
    return tf, tf < floor


def bench_tpu():
    import jax
    import jax.numpy as jnp
    from ragraph_tpu.ops.similarity import l2_normalize
    from ragraph_tpu.ops.topk import topk_gather

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.normal(size=(R, E)).astype(np.float32))
    values = jnp.asarray(rng.normal(size=(R, E)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(Q, E)).astype(np.float32))

    # TPU-native path: keys normalized once at build time (the library
    # stores normalized keys), bf16 on the MXU with f32 accumulation.
    keys_n = l2_normalize(keys).astype(jnp.bfloat16)

    @jax.jit
    def retrieve(q, kn, vals):
        # TPU-native: PartialReduce top-k (lax.approx_max_k) fuses into the
        # matmul consumer — ~400x faster than the full sort at this R and
        # avoids materializing the (Q, R) f32 score matrix in HBM.
        qn = l2_normalize(q).astype(jnp.bfloat16)
        scores = jnp.dot(qn, kn.T, preferred_element_type=jnp.float32)
        s, idx = jax.lax.approx_max_k(scores, K, recall_target=0.99)
        return s, idx, topk_gather(vals, idx)

    @jax.jit
    def recall_vs_exact(q, kn, k_f32):
        _, idx_bf, _ = retrieve(q, kn, values)
        scores = jnp.dot(l2_normalize(q), l2_normalize(k_f32).T,
                         preferred_element_type=jnp.float32)
        _, idx_f32 = jax.lax.top_k(scores, K)
        hit = (idx_bf[:, :, None] == idx_f32[:, None, :]).any(-1)
        return hit.mean()

    recall = float(recall_vs_exact(queries, keys_n, keys))

    # pure-device timing: ITERS retrievals chained inside one jit (each
    # iteration's query depends on the previous result, so nothing is
    # dead-code-eliminated); one scalar returns to host.
    @jax.jit
    def retrieve_chain(q, kn, vals):
        def body(_, carry):
            qq, acc = carry
            s, _, v = retrieve(qq, kn, vals)
            # cheap data dependency: shift queries by a value-derived eps
            return qq + 1e-6 * v[:, 0, :], acc + s[0, 0]
        _, acc = jax.lax.fori_loop(0, ITERS, body, (q, jnp.float32(0)))
        return acc

    # measure tunnel roundtrip (scalar materialization latency)
    for _ in range(WARMUP):
        float(retrieve(queries, keys_n, values)[0][0, 0])
    t0 = time.perf_counter()
    float(retrieve(queries, keys_n, values)[0][0, 0])
    roundtrip = time.perf_counter() - t0

    float(retrieve_chain(queries, keys_n, values))  # compile
    # best-of-3: the tunnel roundtrip and chip state vary run to run
    totals = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(retrieve_chain(queries, keys_n, values))
        totals.append(time.perf_counter() - t0)
    dt = max((min(totals) - roundtrip) / ITERS, 1e-9)

    flops, _ = compiled_costs(retrieve, queries, keys_n, values)
    if flops is None:
        flops = 2.0 * Q * R * E  # the score matmul dominates

    # int8 MXU scoring tier: the key table is quantized ONCE (the serving
    # pattern — per-refresh, like the bf16 cast above; re-quantizing per
    # call is a full HBM pass that erases most of the win). Secondary
    # number of record — the headline stays the bf16 path (higher recall).
    from ragraph_tpu.ops.topk import cosine_topk, quantize_keys_i8

    keys_i8 = quantize_keys_i8(keys)

    @jax.jit
    def retrieve_i8_chain(q, ki):
        def body(_, carry):
            qq, acc = carry
            s, _ = cosine_topk(qq, ki, K, method="approx",
                               score_dtype="int8")
            return qq + 1e-6 * s[:, :1], acc + s[0, 0]
        _, acc = jax.lax.fori_loop(0, ITERS, body, (q, jnp.float32(0)))
        return acc

    float(retrieve_i8_chain(queries, keys_i8))  # compile
    totals = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(retrieve_i8_chain(queries, keys_i8))
        totals.append(time.perf_counter() - t0)
    dt8 = max((min(totals) - roundtrip) / ITERS, 1e-9)

    @jax.jit
    def recall_i8(q, ki, kf):
        _, idx8 = cosine_topk(q, ki, K, method="approx",
                              score_dtype="int8")
        scores = jnp.dot(l2_normalize(q), l2_normalize(kf).T,
                         preferred_element_type=jnp.float32)
        _, idx_f32 = jax.lax.top_k(scores, K)
        return (idx8[:, :, None] == idx_f32[:, None, :]).any(-1).mean()

    recall8 = float(recall_i8(queries, keys_i8, keys))

    # Production int8 tier (VERDICT r3 #4): pre-quantized scoring table +
    # exact rescore of k+22 candidates against the serving-dtype (bf16,
    # same as the headline arm's table) rows — the configuration
    # docs/SERVING.md actually recommends. Reference semantic target:
    # ToyGraphBase.retrieve's exact torch.topk
    # (RAGraph_node/ragraph_utils/ToyGraphBase.py:66-71).
    keys_rs = l2_normalize(keys).astype(jnp.bfloat16)

    @jax.jit
    def retrieve_i8rs_chain(q, ki, kf):
        def body(_, carry):
            qq, acc = carry
            s, _ = cosine_topk(qq, ki, K, method="approx",
                               score_dtype="int8", rescore_pad=22,
                               rescore_keys=kf, keys_normalized=True)
            return qq + 1e-6 * s[:, :1], acc + s[0, 0]
        _, acc = jax.lax.fori_loop(0, ITERS, body, (q, jnp.float32(0)))
        return acc

    float(retrieve_i8rs_chain(queries, keys_i8, keys_rs))  # compile
    totals = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(retrieve_i8rs_chain(queries, keys_i8, keys_rs))
        totals.append(time.perf_counter() - t0)
    dt8rs = max((min(totals) - roundtrip) / ITERS, 1e-9)

    @jax.jit
    def recall_i8rs(q, ki, krs, kf):
        _, idx8 = cosine_topk(q, ki, K, method="approx",
                              score_dtype="int8", rescore_pad=22,
                              rescore_keys=krs, keys_normalized=True)
        scores = jnp.dot(l2_normalize(q), l2_normalize(kf).T,
                         preferred_element_type=jnp.float32)
        _, idx_f32 = jax.lax.top_k(scores, K)
        return (idx8[:, :, None] == idx_f32[:, None, :]).any(-1).mean()

    recall8rs = float(recall_i8rs(queries, keys_i8, keys_rs, keys))
    return (Q / dt, recall, dt, flops / dt, roundtrip, Q / dt8, recall8,
            Q / dt8rs, recall8rs)


def bench_exact_retrieval(roundtrip):
    """(latency_s, throughput_s) per batch for the EXACT two-phase
    bucket top-k (``ops/bucket_topk.bucketed_exact_topk``) on the same
    workload as :func:`bench_tpu` — the data-dependent chain captures
    the historical exact-vs-approx latency ratio (~1.9-2.4x across
    sessions); the independent chain measures the same op without the
    data dependency. The r5 2x2 capture showed the two agree within 1%
    (fori_loop iterations do NOT pipeline on TPU; the r4
    "exact pipelines to faster than approx" finding was a loop-elision
    artifact, retracted — benchmarks/bench_exact_phases.py,
    KERNEL_NOTES). Both are kept so cross-arm drift flags chip-state
    variance within a capture."""
    import jax
    import jax.numpy as jnp
    from ragraph_tpu.ops.bucket_topk import bucketed_exact_topk
    from ragraph_tpu.ops.similarity import l2_normalize

    rng = np.random.default_rng(4)
    keys_n = l2_normalize(jnp.asarray(
        rng.normal(size=(R, E)).astype(np.float32))).astype(jnp.bfloat16)
    queries = jnp.asarray(rng.normal(size=(Q, E)).astype(np.float32))

    @jax.jit
    def chain(q, kn):
        def body(_, carry):
            qq, acc = carry
            s, _ = bucketed_exact_topk(
                l2_normalize(qq).astype(jnp.bfloat16), kn, K)
            return qq + 1e-6 * s[:, :1], acc + s[0, 0]
        _, acc = jax.lax.fori_loop(0, ITERS, body, (q, jnp.float32(0)))
        return acc

    float(chain(queries, keys_n))  # compile
    totals = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(queries, keys_n))
        totals.append(time.perf_counter() - t0)
    dt_lat = max((min(totals) - roundtrip) / ITERS, 1e-9)

    # THROUGHPUT arm: ITERS *independent* batches in one jit. Measured
    # r5: equals the latency arm within 1% — fori_loop iterations do
    # not pipeline on TPU (the r4 "faster than approx" reading of this
    # arm was a loop-elision artifact, retracted). Each iteration's
    # query is perturbed by the LOOP INDEX (not the previous result):
    # iterations stay independent but are distinct computations — a
    # loop-invariant body here lets XLA elide the work entirely (r4
    # smoke run reported 0.106 ms/batch = an impossible >1 PFLOP/s;
    # the loop had been collapsed).
    q_n = l2_normalize(queries).astype(jnp.bfloat16)

    @jax.jit
    def chain_tp(q, kn):
        def body(i, acc):
            qi = q + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
            s, _ = bucketed_exact_topk(qi, kn, K)
            return acc + s[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    float(chain_tp(q_n, keys_n))  # compile
    totals = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain_tp(q_n, keys_n))
        totals.append(time.perf_counter() - t0)
    dt_tp = max((min(totals) - roundtrip) / ITERS, 1e-9)
    return dt_lat, dt_tp


def bench_edge_step(roundtrip):
    """One GraphPro train step (fwd+bwd+Adam) at amazon-like scale:
    128k users x 128k items, 1M interactions (2M directed edges), D=64,
    batch 8192. Returns (step seconds, achieved FLOP/s)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ragraph_tpu.models.edge import (EdgeGraphArrays, EdgeModelConfig,
                                         GraphPro)

    U = I = 1 << 17
    M, D, B = 1 << 20, 64, 8192
    rng = np.random.default_rng(1)
    u = rng.integers(0, U, M).astype(np.int32)
    it = rng.integers(0, I, M).astype(np.int32) + U
    send = np.concatenate([u, it])
    recv = np.concatenate([it, u])
    order = np.argsort(recv, kind="stable")   # receiver-sorted (CSR)
    send, recv = send[order], recv[order]
    deg = np.bincount(send, minlength=U + I).astype(np.float32)
    norm = (1.0 / np.sqrt(np.maximum(deg[send] * deg[recv],
                                     1.0))).astype(np.float32)
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(recv, minlength=U + I))]).astype(np.int32)
    # sender-order auxiliaries + static time softmax: enables the fused
    # custom-VJP propagation (see models/edge/base.lightgcn_propagate)
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

    cfg = EdgeModelConfig(emb_size=D, num_layers=3, edge_dropout=0.2)
    model = GraphPro(cfg, g, phase="pretrain")
    params = model.init_params(jax.random.key(0))
    # item ids are 0-based within the item table (cal_loss indexes the
    # split item half)
    batch = (jnp.asarray(rng.integers(0, U, B).astype(np.int32)),
             jnp.asarray(rng.integers(0, I, B).astype(np.int32)),
             jnp.asarray(rng.integers(0, I, B).astype(np.int32)))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def step(params, opt_state, g, batch, key):
        (l, _), grads = jax.value_and_grad(
            lambda p: model.cal_loss(p, batch, key, graph=g),
            has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    @jax.jit
    def chain(params, opt_state, g, batch, key):
        def body(i, c):
            p, o, acc = c
            p, o, l = step(p, o, g, batch, jax.random.fold_in(key, i))
            return (p, o, acc + l)
        return jax.lax.fori_loop(
            0, EDGE_ITERS, body, (params, opt_state, jnp.float32(0)))[2]

    key = jax.random.key(1)
    float(chain(params, opt_state, g, batch, key))  # compile
    totals = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(params, opt_state, g, batch, key))
        totals.append(time.perf_counter() - t0)
    dt = max((min(totals) - roundtrip) / EDGE_ITERS, 1e-9)
    flops, bytes_acc = compiled_costs(step, params, opt_state, g, batch, key)
    return dt, (flops / dt if flops else None), \
        (bytes_acc / dt if bytes_acc else None)


def measure_roundtrip():
    """Tunnel roundtrip latency for a scalar materialization."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.float32(1.0)
    for _ in range(WARMUP):
        float(f(x))
    t0 = time.perf_counter()
    float(f(x))
    return time.perf_counter() - t0


def bench_library_build():
    """Library-build throughput (graphs/s): the vmapped per-graph pipeline
    (pagerank inverse sampling + augmentation + encoder + k-hop
    propagation + position codes) that replaces the reference's per-graph
    Python loop (``RAGraph_node/ragraph_utils/ToyGraphBase.py:40-45``).
    Same workload as benchmarks/bench_library_build.py."""
    import jax
    import jax.numpy as jnp
    from ragraph_tpu.core.graph import normalize_adj_dense
    from ragraph_tpu.rag.library import LibraryConfig, build_entries_batch

    B, N, F, HID, C = 128, 32, 16, 64, 3
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(B, N, F)).astype(np.float32)
    adj = (rng.random((B, N, N)) < 0.2).astype(np.float32)
    adj = np.triu(adj, 1)
    adj = adj + adj.transpose(0, 2, 1)
    labels = np.eye(C, dtype=np.float32)[rng.integers(0, C, (B, N))]
    w = jax.random.normal(jax.random.key(0), (F, HID)) * 0.1

    def encoder(f, a, mask=None):
        return jnp.tanh(a @ (f @ w))

    cfg = LibraryConfig(level="node", num_inverse_sample=10,
                        num_augment_scale=3, use_positions=True,
                        num_anchors=10, dis_q=10, toy_graph_hop=2)
    adj_n = jax.vmap(normalize_adj_dense)(jnp.asarray(adj))
    args = (jnp.asarray(feats), adj_n, jnp.asarray(labels),
            jnp.ones((B, N), bool), jnp.zeros((B, C)))
    iters = 30

    # Chain the iterations inside ONE jit: separate async dispatches
    # through the tunnel cost ~ms each, which swamps an ~3 ms build and
    # made this number track tunnel latency, not build throughput.
    @jax.jit
    def chain(f, a, l, m, g, key):
        def body(i, acc):
            out = build_entries_batch(encoder, f, a, l, m, g, cfg=cfg,
                                      key=jax.random.fold_in(key, i))
            leaves = jax.tree_util.tree_leaves(out)
            return acc + leaves[0].astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(chain(*args, jax.random.key(1)))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*args, jax.random.key(1)))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / iters
    return B / dt


def bench_node_step(roundtrip):
    """One RAGraph node-task fine-tune step (forward incl. retrieval from
    a 4096-entry library + backward + Adam) on a 2048-node dense graph,
    emb 256 — the ``RAGraph_node/finetune-rag.py:75-84`` inner loop.
    Returns step seconds."""
    import jax
    import jax.numpy as jnp
    import optax
    import dataclasses

    from ragraph_tpu.core.graph import DenseGraph, normalize_adj_dense
    from ragraph_tpu.models.ragraph_node import (RAGraphNode,
                                                 RAGraphNodeConfig)

    N, F, C, CAP = 2048, 256, 10, 4096
    cfg = RAGraphNodeConfig(emb_size=256, num_class=C)
    model = RAGraphNode(cfg, F)
    state = model.init_state(jax.random.key(0), library_capacity=CAP)
    rng = np.random.default_rng(2)
    # populate the library so retrieval hits real rows
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

    opt = optax.adam(1e-3)
    params = {"encoder": state.encoder_params,
              "decoder": state.decoder_params}
    opt_state = opt.init(params)
    train_step = model.make_train_step(opt)

    def make_chain(iters):
        @jax.jit
        def chain(state, opt_state, graph, key):
            def body(i, c):
                s, o, acc = c
                s, o, l = train_step(s, o, graph,
                                     jax.random.fold_in(key, i))
                return (s, o, acc + l)
            return jax.lax.fori_loop(
                0, iters, body, (state, opt_state, jnp.float32(0)))[2]
        return chain

    # The step is fast enough (~0.16 ms) that a NODE_ITERS chain takes
    # LESS than one tunnel roundtrip (several ms, varies per session) —
    # subtracting the roundtrip went negative and clamped to 0. Time two
    # chain lengths instead; the slope cancels the dispatch+roundtrip
    # constant exactly.
    del roundtrip
    short, long_ = make_chain(NODE_ITERS), make_chain(4 * NODE_ITERS)
    key = jax.random.key(3)
    float(short(state, opt_state, graph, key))  # compile
    float(long_(state, opt_state, graph, key))
    ts, tl = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(short(state, opt_state, graph, key))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(long_(state, opt_state, graph, key))
        tl.append(time.perf_counter() - t0)
    return max((min(tl) - min(ts)) / (3 * NODE_ITERS), 1e-9)


def bench_selection(roundtrip):
    """Exact k-th-largest selection (``ops/selection.rowwise_kth_largest``
    — the huge-k RAG fusion's membership threshold, replacing the
    reference's chunked ``torch.topk`` at ``retrieve_num=100000`` scale,
    ``RAGraph_edge/modules/RAGraph.py:298-324``) at the koubei chunk
    shape (256, 442368), k=100000, plus the ``lax.top_k`` near-full sort
    it replaces. Returns (selection ms, sort ms). Data is generated on
    device — a (256, 442k) f32 host upload has no place in a bench."""
    import jax
    import jax.numpy as jnp

    from ragraph_tpu.ops.selection import rowwise_kth_largest

    qs, rs, ks = 256, 442_368, 100_000
    x = jax.random.normal(jax.random.key(5), (qs, rs), jnp.float32)

    def timed_chain(select_fn, iters, reps):
        @jax.jit
        def chain(x):
            def body(_, c):
                xx, acc = c
                kth = select_fn(xx)
                return xx + 1e-6 * kth, acc + kth[0, 0]
            return jax.lax.fori_loop(0, iters, body,
                                     (x, jnp.float32(0)))[1]

        float(chain(x))  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x))
            ts.append(time.perf_counter() - t0)
        return max((min(ts) - roundtrip) / iters, 1e-9) * 1e3

    sel_ms = timed_chain(lambda xx: rowwise_kth_largest(xx, ks), 20, 3)
    sort_ms = timed_chain(lambda xx: jax.lax.top_k(xx, ks)[0][:, -1:],
                          3, 2)
    return sel_ms, sort_ms


def bench_serving(roundtrip):
    """Serving hot path (``RAGraphEdge.recommend_from``: per-request user
    gather -> score matmul -> history filter -> top-20 from PRECOMPUTED
    embeddings; the reference's serving is a bare ``U @ I^T`` inside eval,
    ``RAGraph_edge/modules/RAGraph.py:362``) at B=4096 users over 131k
    items via the fused hist_pad candidate path — the deployment shape of
    ``benchmarks/bench_serving.py``, which holds the full latency table.
    Returns users/s."""
    import jax
    import jax.numpy as jnp

    from ragraph_tpu.models.edge.ragraph_edge import TemporalLightGCN

    nu = ni = 1 << 17
    d, b = 64, 4096
    ku, ki, kq, kh = jax.random.split(jax.random.key(11), 4)
    ue = jax.random.normal(ku, (nu, d), jnp.float32) * 0.1
    ie = jax.random.normal(ki, (ni, d), jnp.float32) * 0.1
    users0 = jax.random.randint(kq, (b,), 0, nu, jnp.int32)
    hist_rows = jax.random.randint(kh, (32,), 0, b, jnp.int32)
    hist_cols = jax.random.randint(jax.random.fold_in(kh, 1), (32,), 0,
                                   ni, jnp.int32)
    iters = 30

    @jax.jit
    def chain(ue, ie, users):
        def body(_, carry):
            us, acc = carry
            s, idx = TemporalLightGCN.recommend_from(
                ue, ie, us, k=20, hist_rows=hist_rows,
                hist_cols=hist_cols, hist_pad=64, recall_target=0.95)
            # next request's users derive from this result (no DCE)
            us = (us + idx[:, 0].astype(jnp.int32)) % nu
            return us, acc + s[0, 0]
        return jax.lax.fori_loop(0, iters, body,
                                 (users, jnp.float32(0)))[1]

    float(chain(ue, ie, users0))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(ue, ie, users0))
        ts.append(time.perf_counter() - t0)
    dt = max((min(ts) - roundtrip) / iters, 1e-9)
    return b / dt


def bench_torch_cpu():
    import torch
    torch.manual_seed(0)
    q_small = 256  # subsample; report throughput (queries/s)
    keys = torch.randn(R, E)
    values = torch.randn(R, E)
    queries = torch.randn(q_small, E)
    keys_n = torch.nn.functional.normalize(keys, dim=-1)

    def retrieve(q):
        qn = torch.nn.functional.normalize(q, dim=-1)
        scores = qn @ keys_n.T
        s, idx = torch.topk(scores, K)
        return values[idx]

    retrieve(queries)  # warmup
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        retrieve(queries)
    dt = (time.perf_counter() - t0) / iters
    return q_small / dt


def main():
    peak, peak_bw = chip_peaks()
    roundtrip0 = measure_roundtrip()
    probe_tf, degraded = wait_until_healthy(roundtrip0, peak)
    print(f"# calibration probe: {probe_tf:.1f} TFLOP/s "
          f"(degraded={degraded})", file=sys.stderr)

    (tpu_qps, recall, dt, flops_s, roundtrip, i8_qps, i8_recall,
     i8rs_qps, i8rs_recall) = bench_tpu()
    exact_dt, exact_tp_dt = bench_exact_retrieval(roundtrip)
    edge_dt, _, edge_bytes_s = bench_edge_step(roundtrip)  # FLOP/s unused:
    # the edge step is gather-bound, HBM bandwidth is its ceiling
    lib_gps = bench_library_build()
    node_dt = bench_node_step(roundtrip)
    sel_ms, sort_ms = bench_selection(roundtrip)
    serving_ups = bench_serving(roundtrip)
    cpu_qps = bench_torch_cpu()
    speedup = tpu_qps / cpu_qps

    # post-measurement probe: if the chip degraded DURING the run, the
    # numbers above are suspect — flag them.
    probe_tf_post = calibration_probe(roundtrip0)
    floor = (PROBE_MIN_FRACTION * peak / 1e12) if peak else 20.0
    if probe_tf_post < floor:
        degraded = True
        print(f"# post-run probe {probe_tf_post:.1f} TFLOP/s < floor "
              f"{floor:.1f} — chip degraded during measurement",
              file=sys.stderr)

    mfu = round(flops_s / peak, 4) if peak else None
    # the edge step is gather/bandwidth-bound, so its utilization metric
    # is achieved HBM bytes/s over peak, not FLOP/s
    edge_bwu = (round(edge_bytes_s / peak_bw, 4)
                if peak_bw and edge_bytes_s else None)
    print(f"# R={R} E={E} Q={Q} k={K}: TPU {tpu_qps:,.0f} q/s "
          f"({dt*1e3:.3f} ms/batch, recall@{K} vs f32 = {recall:.4f}, "
          f"{flops_s/1e12:.1f} TFLOP/s = {mfu} MFU); "
          f"exact top-k {exact_dt*1e3:.2f} ms/batch latency "
          f"({exact_dt/dt:.2f}x approx), {exact_tp_dt*1e3:.2f} ms "
          f"sustained ({exact_tp_dt/dt:.2f}x approx); "
          f"int8 tier {i8_qps:,.0f} q/s (recall {i8_recall:.4f}); "
          f"int8+rescore {i8rs_qps:,.0f} q/s "
          f"(recall {i8rs_recall:.4f}); "
          f"edge train step {edge_dt*1e3:.2f} ms "
          f"({(edge_bytes_s or 0)/1e9:.0f} GB/s = {edge_bwu} of peak HBM "
          f"bw); library build {lib_gps:,.0f} graphs/s; "
          f"node step {node_dt*1e3:.2f} ms; "
          f"k-th selection {sel_ms:.2f} ms vs sort {sort_ms:.1f} ms "
          f"({sort_ms/sel_ms:.1f}x); "
          f"serving {serving_ups:,.0f} users/s; "
          f"torch-CPU {cpu_qps:,.0f} q/s", file=sys.stderr)
    print(json.dumps({
        "metric": "retrieval_qps",
        "value": round(tpu_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(speedup, 2),
        "mfu": mfu,
        "exact_retrieval_ms": round(exact_dt * 1e3, 3),
        "exact_vs_approx": round(exact_dt / dt, 2),
        # independent-batch arm: measured equal to the latency arm
        # within 1% (r5 2x2 — kept as a within-capture drift check)
        "exact_throughput_ms": round(exact_tp_dt * 1e3, 3),
        "exact_tp_vs_approx": round(exact_tp_dt / dt, 2),
        "int8_retrieval_qps": round(i8_qps, 1),
        "int8_recall": round(i8_recall, 4),
        "int8_rescore_qps": round(i8rs_qps, 1),
        "int8_rescore_recall": round(i8rs_recall, 4),
        "edge_step_ms": round(edge_dt * 1e3, 3),
        "edge_step_bw_util": edge_bwu,
        "library_build_gps": round(lib_gps, 1),
        "node_step_ms": round(node_dt * 1e3, 3),
        "selection_kth_ms": round(sel_ms, 3),
        "selection_vs_sort": round(sort_ms / sel_ms, 1),
        "serving_users_per_s": round(serving_ups, 1),
        "probe_tflops": round(probe_tf, 1),
        "probe_tflops_post": round(probe_tf_post, 1),
        "degraded": degraded,
    }))


if __name__ == "__main__":
    main()
