"""Edge train-step ablation: propagation backend x dtype x time mode.

Workload matches bench.py's edge section (128k x 128k nodes, 1M
interactions = 2M directed edges, D=64, batch 8192, GraphPro pretrain,
fwd+bwd+Adam).

Endpoints measured via bench.py on v5e: scatter+f32+renorm (the r1
default) 334 ms/step; fused+bf16+static 88 ms/step (r2 mid-round);
57.5 ms/step with the packed dual-half scan + in-triangle weights +
pure bf16 gathers (r2 final — see docs/KERNEL_NOTES.md).
Run this script on TPU to fill in the intermediate ablations.

Run: python benchmarks/bench_edge_step.py
"""

import time

import numpy as np

U = I = 1 << 17
M, D, B = 1 << 20, 64, 8192
ITERS = 20


def build_graph():
    import jax.numpy as jnp

    from ragraph_tpu.models.edge import EdgeGraphArrays

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
    perm = np.argsort(send, kind="stable").astype(np.int32)
    sip = np.concatenate(
        [[0], np.cumsum(np.bincount(send, minlength=U + I))]).astype(np.int32)
    tn = np.ones(2 * M, np.float32)
    tn /= np.maximum(np.bincount(recv, minlength=U + I), 1.0)[recv]
    return EdgeGraphArrays(
        senders=jnp.asarray(send), receivers=jnp.asarray(recv),
        edge_norm=jnp.asarray(norm),
        edge_times=jnp.zeros(2 * M, jnp.float32),
        num_users=U, num_items=I, recv_indptr=jnp.asarray(indptr),
        send_perm=jnp.asarray(perm), send_indptr=jnp.asarray(sip),
        recv_of_send=jnp.asarray(recv[perm].astype(np.int32)),
        edge_norm_send=jnp.asarray(norm[perm]),
        time_norm=jnp.asarray(tn), time_norm_send=jnp.asarray(tn[perm]))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from ragraph_tpu.models.edge import EdgeModelConfig, GraphPro

    g = build_graph()
    rng = np.random.default_rng(2)
    batch = (jnp.asarray(rng.integers(0, U, B).astype(np.int32)),
             jnp.asarray(rng.integers(U, U + I, B).astype(np.int32)),
             jnp.asarray(rng.integers(U, U + I, B).astype(np.int32)))
    opt = optax.adam(1e-3)

    def bench(name, **cfg_kw):
        cfg = EdgeModelConfig(emb_size=D, num_layers=3, edge_dropout=0.2,
                              **cfg_kw)
        model = GraphPro(cfg, g, phase="pretrain")
        params = model.init_params(jax.random.key(0))

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
                0, ITERS, body, (params, opt_state, jnp.float32(0)))[2]

        key = jax.random.key(1)
        opt_state = opt.init(params)
        float(chain(params, opt_state, g, batch, key))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(params, opt_state, g, batch, key))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)/ITERS*1e3:.2f} ms/step")

    bench("scatter f32 renorm", segsum_impl="scatter",
          propagate_dtype="f32", time_mode="renorm")
    bench("sorted  f32 renorm", segsum_impl="sorted",
          propagate_dtype="f32", time_mode="renorm")
    bench("sorted  f32 static", segsum_impl="sorted",
          propagate_dtype="f32", time_mode="static")
    bench("fused   f32 static", segsum_impl="fused",
          propagate_dtype="f32", time_mode="static")
    bench("fused   bf16 static (default)", segsum_impl="fused",
          propagate_dtype="bf16", time_mode="static")


if __name__ == "__main__":
    main()
