"""Koubei-scale dry run of the `retrieve_num=100000` vanilla config
(VERDICT r2 #9).

The real koubei/taobao splits are stripped from the snapshot
(``/root/reference/.MISSING_LARGE_BLOBS``); this proves the koubei
VANILLA config shape — ``EDGE_DATASET_CONFIGS['koubei']['vanilla']``:
``retrieve_num=100000, rag_chunk=512, num_augment_scale=1`` — compiles
and fits HBM at koubei's published scale (~120k users × ~101k items,
~1.5M interactions; id ranges confirmed against the surviving
``dataset/koubei/test_1.txt``).

The stressor is the per-forward retrieval: every node queries the
resource library for its top-100000 rows. A naive (N, k) index +
(N, k, E) gather is petabyte-scale; ``RAGraphEdge._fuse_rag`` computes
the mean inside the 512-query chunk loop and switches to the
score-threshold membership matmul for huge k (see the docstring there).

Records wall time + device memory stats into
``results/koubei_scale_dryrun.json`` and a SCALING.md line.

Usage: python experiments/koubei_scale_dryrun.py  (real TPU, ~minutes)
"""

import json
import os
import time

import numpy as np

SAVE = "results"
U, I = 119_958, 101_404          # koubei published scale
M = 1_500_000                    # ~1.5M interactions


def main():
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from ragraph_tpu.models.edge import (EdgeGraphArrays, RAGraphEdge,
                                         edge_config_for)
    from ragraph_tpu.train import RankingEvaluator

    rng = np.random.default_rng(0)
    n = U + I
    u = rng.integers(0, U, M).astype(np.int32)
    it = (rng.integers(0, I, M) + U).astype(np.int32)
    send = np.concatenate([u, it])
    recv = np.concatenate([it, u])
    order = np.argsort(recv, kind="stable")
    send, recv = send[order], recv[order]
    deg = np.bincount(send, minlength=n).astype(np.float32)
    norm = (1.0 / np.sqrt(np.maximum(deg[send] * deg[recv], 1.0))
            ).astype(np.float32)
    times = rng.integers(0, 100, 2 * M).astype(np.float32)
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(recv, minlength=n))]).astype(np.int32)

    g = EdgeGraphArrays(senders=jnp.asarray(send),
                        receivers=jnp.asarray(recv),
                        edge_norm=jnp.asarray(norm),
                        edge_times=jnp.asarray(times),
                        num_users=U, num_items=I,
                        recv_indptr=jnp.asarray(indptr))
    cfg = edge_config_for("koubei", "vanilla", emb_size=64, num_layers=3)
    print(f"koubei vanilla config: retrieve_num={cfg.retrieve_num} "
          f"rag_chunk={cfg.rag_chunk} "
          f"num_augment_scale={cfg.num_augment_scale}")
    model = RAGraphEdge(cfg, g, phase="vanilla")
    params = {
        "user_embedding": jnp.asarray(
            rng.normal(scale=0.1, size=(U, 64)).astype(np.float32)),
        "item_embedding": jnp.asarray(
            rng.normal(scale=0.1, size=(I, 64)).astype(np.float32)),
    }

    t0 = time.time()
    u0, i0 = jax.jit(model.generate)(params)
    jax.block_until_ready((u0, i0))
    t_gen0 = time.time() - t0
    print(f"plain generate (resource-graph build input): {t_gen0:.1f}s")

    t0 = time.time()
    model.make_resource_graph(u0, i0, jr.key(0))
    jax.block_until_ready(model.resource_keys)
    t_lib = time.time() - t0
    res_rows = int(model.resource_keys.shape[0])
    print(f"resource graph: {res_rows} rows in {t_lib:.1f}s")
    del u0, i0

    # the money shot: full-graph generate with top-100000 retrieval
    # fusion for all 221k nodes. Resources enter as jit ARGUMENTS —
    # closure-captured 113 MB constants overflow the remote-compile
    # request (the IVF bench incident, CLAUDE.md)
    res = (model.resource_keys, model.resource_values)
    model.resource_keys = model.resource_values = None
    gen_rag = jax.jit(lambda p, rk, rv: model.generate(
        p, resources=(rk, rv)))
    t0 = time.time()
    ue, ie = gen_rag(params, *res)
    jax.block_until_ready((ue, ie))
    t_fused = time.time() - t0
    print(f"RAG generate (top-{cfg.retrieve_num} x {n} queries): "
          f"{t_fused:.1f}s")

    # memory stats
    ms = jax.devices()[0].memory_stats() or {}
    peak = ms.get("peak_bytes_in_use", 0)
    limit = ms.get("bytes_limit", 0)
    print(f"peak HBM {peak/2**30:.2f} GiB of {limit/2**30:.2f} GiB")

    # tiny eval proves the output tensors are usable end-to-end
    ev = RankingEvaluator(ks=(20,))
    test_dict = {int(q): [int(rng.integers(0, I))] for q in range(256)}
    res = ev.evaluate(ue, ie, test_dict, {})
    out = {
        "num_users": U, "num_items": I, "interactions": M,
        "retrieve_num": cfg.retrieve_num, "rag_chunk": cfg.rag_chunk,
        "resource_rows": res_rows,
        "generate_plain_s": round(t_gen0, 2),
        "resource_build_s": round(t_lib, 2),
        "generate_rag_s": round(t_fused, 2),
        "peak_hbm_gib": round(peak / 2**30, 3),
        "hbm_limit_gib": round(limit / 2**30, 3),
        "eval_recall_smoke": float(res["recall"][0]),
    }
    os.makedirs(SAVE, exist_ok=True)
    with open(os.path.join(SAVE, "koubei_scale_dryrun.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    from ragraph_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    main()
