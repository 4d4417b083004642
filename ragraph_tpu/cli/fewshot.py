"""Few-shot task CLI driver.

Reference entry points replaced:
- ``RAGraph_node_fewshot/finetune-rag.py`` → ``python -m
  ragraph_tpu.cli.fewshot finetune``
- ``RAGraph_node_fewshot/vanilla-rag.py`` → ``... vanilla``
- graph-level variants via ``--level graph``.

Protocol parity (``RAGraph_node_fewshot/finetune-rag.py:50-150``): per
task i, a k-shot support split (exported via
``ragraph_tpu.data.fewshot_export`` or sampled on the fly), class
prototypes recomputed each step, CE over cosine-to-prototype scores,
val-append before test, mean±std accuracy over tasks.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("ragraph_tpu.fewshot")
    p.add_argument("mode", choices=["finetune", "vanilla"])
    p.add_argument("--dataset", default="SYNTH")
    p.add_argument("--data-root", default="data")
    p.add_argument("--level", choices=["node", "graph"], default="node")
    p.add_argument("--shots", type=int, default=5)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--retrieve-num", type=int, default=5)
    p.add_argument("--retrieve-weight", type=float, default=None,
                   help="override the per-dataset fusion weight table "
                        "(the reference hardwires weights by dataset name "
                        "and raises on unknown names, RAGraph_node_fewshot/"
                        "RAGraph.py:24-33)")
    p.add_argument("--label-weight", type=float, default=None)
    p.add_argument("--test-times", type=int, default=5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--patience", type=int, default=None,
                   help="early-stop patience on epoch loss with best-state "
                        "restore (the reference drivers' best-loss "
                        "checkpointing, RAGraph_node_fewshot/"
                        "finetune-rag.py:111-120; default: off, train all "
                        "--epochs and keep the final state)")
    p.add_argument("--support-dir", default=None,
                   help="load k-shot support sets from <dir>/<task>.npz "
                        "(falling back to <dir>/support.npz, the graph "
                        "driver's single shared set) instead of sampling; "
                        "keys: features/labels/adj, + graph_len at "
                        "--level graph. Produced by "
                        "ragraph_tpu.data.fewshot_export.")
    p.add_argument("--noise", action="store_true")
    p.add_argument("--save-dir", default="modelset")
    p.add_argument("--results-dir", default="results")
    p.add_argument("--library-capacity", type=int, default=65536)
    p.add_argument("--mesh", default=None, metavar="dp=D,idx=I",
                   help="multi-chip layout: the library is BUILT sharded "
                        "over idx (shard_map compacting appends, "
                        "parallel/sharded_library.py), fine-tune batches "
                        "shard over dp with replicated encoder params and "
                        "support prototypes (XLA inserts the gradient "
                        "all-reduce). dp*idx must equal the device count; "
                        "library capacity must divide by idx.")
    return p


def main(argv=None):
    from ragraph_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    args = build_parser().parse_args(argv)

    import jax.random as jr
    import optax

    from ragraph_tpu.data import (flat_batches, load_tu_dataset,
                                  stacked_batches, synthetic_tu_dataset)
    from ragraph_tpu.data.fewshot_export import (sample_k_shot_graphs,
                                                 sample_k_shot_nodes)
    from ragraph_tpu.models import (FEWSHOT_NODE_WEIGHTS,
                                    FEWSHOT_GRAPH_WEIGHTS,
                                    FewshotSupportSet, RAGraphFewshot,
                                    RAGraphFewshotConfig,
                                    fewshot_library_config)
    from ragraph_tpu.train import RunLogger, restore_checkpoint
    from ragraph_tpu.utils import seed_everything
    import jax.numpy as jnp

    log = RunLogger(exp_name=f"fewshot-{args.mode}")
    seed_everything(args.seed)
    if args.dataset == "SYNTH":
        ds = synthetic_tu_dataset(seed=0, num_graphs=120, num_classes=3,
                                  feat_dim=16)
    elif args.dataset == "SYNTH-HARD":
        # low feature signal + noisy blocks: node accuracy no longer
        # saturates with a random encoder, so the finetune-vs-vanilla
        # ordering is visible (plain SYNTH sits at ~98% for both)
        ds = synthetic_tu_dataset(seed=0, num_graphs=120, num_classes=3,
                                  feat_dim=16, signal=0.6, p_in=0.35,
                                  p_out=0.15, name="SYNTH-HARD")
    else:
        ds = load_tu_dataset(args.data_root, args.dataset)
    num_class = max(ds.num_node_classes, 2)

    enc_params = None
    ckpt = os.path.join(args.save_dir, f"model_{args.dataset}")
    try:
        enc_params = restore_checkpoint(ckpt, use_orbax=False)
        # the fewshot encoder needs 2 layers (encode/decode split); a
        # checkpoint pretrained with fewer layers cannot be loaded
        gcn = enc_params.get("params", {}).get("gcn", {})
        if "conv_1" not in gcn:
            log(f"checkpoint {ckpt} has <2 encoder layers; using random "
                f"2-layer init (pretrain with --encoder-layers 2 first)")
            enc_params = None
        else:
            log(f"loaded pretrain checkpoint {ckpt}")
    except FileNotFoundError:
        log("no pretrain checkpoint; random 2-layer encoder init")

    weights = (FEWSHOT_NODE_WEIGHTS if args.level == "node"
               else FEWSHOT_GRAPH_WEIGHTS)
    rw, lw = weights.get(args.dataset, (0.5, 0.5))
    if args.retrieve_weight is not None:
        rw = args.retrieve_weight
    if args.label_weight is not None:
        lw = args.label_weight
    finetune = args.mode == "finetune"

    from ragraph_tpu.cli.node import _make_mesh
    mesh = _make_mesh(args)
    shard_lib = mesh is not None and int(mesh.shape["idx"]) > 1

    accs = []
    for task_i in range(args.test_times):
        rng = np.random.default_rng(task_i)
        dsi = ds.shuffle(rng)
        train = dsi.subset(0, .5)
        val = dsi.subset(.5, .8)
        test = dsi.subset(.8, 1)
        pad = args.batch_size * max(g.features.shape[0] for g in ds.graphs)

        graph_ids = None
        if args.support_dir is not None:
            path = os.path.join(args.support_dir, f"{task_i}.npz")
            if not os.path.exists(path):
                # the reference graph-fewshot driver loads ONE support
                # set shared by every task (finetune-rag.py:51-55)
                path = os.path.join(args.support_dir, "support.npz")
            data = np.load(path)
            feats, labels, adj = (data["features"], data["labels"],
                                  data["adj"])
            if "graph_len" in data:
                lens = data["graph_len"]
                graph_ids = np.repeat(np.arange(len(lens)), lens)
        elif args.level == "graph":
            feats, adj, labels, lens = sample_k_shot_graphs(
                train, args.shots, num_class, rng)
            graph_ids = np.repeat(np.arange(len(lens)), lens)
        else:
            feats, labels, adj = sample_k_shot_nodes(train, args.shots,
                                                     num_class, rng)
        support = FewshotSupportSet(
            features=jnp.asarray(feats), adj=jnp.asarray(adj),
            labels=jnp.asarray(labels, dtype=jnp.int32),
            graph_ids=(None if graph_ids is None
                       else jnp.asarray(graph_ids, dtype=jnp.int32)))

        libcfg = fewshot_library_config(retrieve_num=args.retrieve_num)
        cfg = RAGraphFewshotConfig(
            emb_size=args.hidden, num_class=num_class, level=args.level,
            retrieve_weight=rw, label_weight=lw,
            query_graph_hop=3 if args.level == "node" else 1,
            finetune=finetune, noise_finetune=args.noise,
            encoder_layers=2, library=libcfg)
        task = RAGraphFewshot(cfg, feature_dim=ds.num_node_attributes)
        state = task.init_state(jr.key(task_i), support,
                                encoder_params=enc_params,
                                library_capacity=args.library_capacity)

        def _lib_batches(graphs):
            return stacked_batches(graphs, args.batch_size,
                                   num_classes=num_class,
                                   num_graph_classes=num_class)

        def _append(state, graphs, key):
            """Library append — shard_map compacting appends on the
            idx-sharded store when a >1 idx axis is up (the full store
            never exists on one device), else the single-device path."""
            if not shard_lib:
                return task.build_library(state, _lib_batches(graphs), key)
            import dataclasses as _dc

            from ragraph_tpu.parallel import build_sharded_library
            params = state.encoder_params

            def enc_fn(features, adj, node_mask=None):
                return task._encode(params, features, adj, node_mask)

            lib = build_sharded_library(mesh, state.library, enc_fn,
                                        _lib_batches(graphs), cfg.library,
                                        key)
            return _dc.replace(state, library=lib)

        if mesh is not None:
            import dataclasses as _dc

            from ragraph_tpu.parallel import (replicate,
                                              sharded_library_init)
            lib = (sharded_library_init(mesh, args.library_capacity,
                                        cfg.emb_size, num_class,
                                        num_anchors=cfg.library.num_anchors)
                   if shard_lib else state.library)
            state = _dc.replace(
                state,
                encoder_params=replicate(mesh, state.encoder_params),
                support=replicate(mesh, state.support),
                library=lib)

        state = _append(state, train.graphs, jr.key(task_i + 100))

        if finetune:
            opt = optax.adamw(args.lr, weight_decay=args.weight_decay)
            if args.level == "node":
                tstep = task.make_train_step_node(opt)
                batches = list(flat_batches(val.graphs, args.batch_size,
                                            pad, num_classes=num_class))
            else:
                tstep = task.make_train_step_graph(opt)
                batches = list(stacked_batches(val.graphs, args.batch_size,
                                               num_classes=num_class,
                                               num_graph_classes=num_class))
            if mesh is not None:
                from ragraph_tpu.parallel import shard_batch
                batches = [shard_batch(mesh, b) for b in batches]
            opt_state = opt.init(state.encoder_params)
            best_loss, best_params, trigger = float("inf"), None, 0
            for epoch in range(args.epochs):
                tot = 0.0
                for i, g in enumerate(batches):
                    state, opt_state, loss = tstep(
                        state, opt_state, g,
                        jr.fold_in(jr.key(task_i + 200), epoch * 999 + i))
                    tot += float(loss)
                epoch_loss = tot / max(len(batches), 1)
                if epoch % 10 == 0:
                    log.log_loss(epoch, {"loss": epoch_loss})
                if args.patience is not None:
                    # best-loss checkpoint + patience early stop
                    # (finetune-rag.py:111-120); only the encoder params
                    # train, so they are the whole checkpoint
                    if epoch_loss < best_loss:
                        best_loss, trigger = epoch_loss, 0
                        best_params = state.encoder_params
                    else:
                        trigger += 1
                        if trigger >= args.patience:
                            log(f"early stop at epoch {epoch}")
                            break
            if args.patience is not None and best_params is not None:
                import dataclasses as _dc
                state = _dc.replace(state, encoder_params=best_params)

        # reference protocol: append val entries before test
        state = _append(state, val.graphs, jr.key(task_i + 300))

        if args.level == "node":
            acc = task.accuracy_node(
                state, flat_batches(test.graphs, args.batch_size, pad,
                                    num_classes=num_class))
        else:
            acc = task.accuracy_graph(
                state, stacked_batches(test.graphs, args.batch_size,
                                       num_classes=num_class,
                                       num_graph_classes=num_class))
        accs.append(100.0 * acc)
        log(f"task {task_i + 1}/{args.test_times}: accuracy {accs[-1]:.4f}")

    mean, std = float(np.mean(accs)), float(np.std(accs))
    log(f"shots={args.shots} Mean: [{mean:.4f}]  Std: [{std:.4f}]")
    os.makedirs(args.results_dir, exist_ok=True)
    out = os.path.join(
        args.results_dir,
        f"fewshot_{args.mode}_{args.level}_{args.dataset}"
        f"_shot{args.shots}.json")
    with open(out, "w") as f:
        json.dump({"mean": mean, "std": std, "accuracy": accs}, f, indent=4)
    return mean


if __name__ == "__main__":
    main()
