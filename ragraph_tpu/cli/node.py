"""Node/graph-task CLI drivers.

Reference entry points replaced (one typed driver instead of five
copy-pasted scripts):
- ``RAGraph_node/pretrain.py`` → ``python -m ragraph_tpu.cli.node pretrain``
- ``RAGraph_node/finetune-rag.py`` → ``... finetune``
- ``RAGraph_node/finetune-noise.py`` → ``... finetune --noise``
- ``RAGraph_node/vanilla-rag.py`` → ``... vanilla``
- graph-level variants via ``--level graph``.

Protocol parity: 5 seeded reruns with shuffled 0.5/0.3/0.8 splits
(``finetune-rag.py:45-55``), library built from train, fine-tune on val,
val entries appended before test (``:97``), mean±std accuracy + JSON dump
(``:117-132``).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("ragraph_tpu.node")
    p.add_argument("mode", choices=["pretrain", "finetune", "vanilla"])
    p.add_argument("--dataset", default="SYNTH",
                   help="TU dataset name, or SYNTH for synthetic")
    p.add_argument("--data-root", default="data")
    p.add_argument("--level", choices=["node", "graph"], default="node")
    p.add_argument("--noise", action="store_true",
                   help="adversarial noise-retrieval fine-tuning")
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--pretrain-loss", default="lp",
                   help="'+'-joined objectives: lp, dgi, graphcl[:FLAVOR] "
                        "with FLAVOR in {edge,mask,node,subgraph} "
                        "(models/graphcl.py:29-41); the reference's live "
                        "loss is lp (RAGraph_node/preprompt.py:50-55)")
    p.add_argument("--encoder-layers", type=int, default=1)
    p.add_argument("--lp-samples", type=int, default=100,
                   help="negatives per node for the Lp pretrain tuples "
                        "(the node driver passes 100, the graph driver 50 "
                        "— RAGraph_node/pretrain.py:118, "
                        "RAGraph_graph/pretrain.py:85)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--pretrain-epochs", type=int, default=30)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--test-times", type=int, default=5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--save-dir", default="modelset")
    p.add_argument("--results-dir", default="results")
    p.add_argument("--library-capacity", type=int, default=65536)
    p.add_argument("--retrieve-dtype", choices=["input", "int8"],
                   default="input",
                   help="int8: double-rate MXU retrieval scoring "
                        "(recall@10 0.92 raw / 0.9875 with "
                        "--retrieve-rescore-pad 22; the matmul speedup "
                        "is partly offset by per-call table quantization "
                        "here — the full 2.2x needs a pre-quantized "
                        "serving table, see docs/SERVING.md)")
    p.add_argument("--retrieve-rescore-pad", type=int, default=0,
                   help="with --retrieve-dtype int8: exact-rescore "
                        "k+PAD int8 candidates")
    p.add_argument("--mesh", default=None, metavar="dp=D,idx=I",
                   help="multi-chip layout for finetune/vanilla: the "
                        "library is BUILT sharded over idx (the full "
                        "store never exists on one device, "
                        "parallel/sharded_library.py), fine-tune batches "
                        "shard over dp with replicated params (XLA "
                        "inserts the gradient all-reduce). dp*idx must "
                        "equal the device count; library capacity must "
                        "divide by idx.")
    return p


def _make_mesh(args):
    if not getattr(args, "mesh", None):
        return None
    from ragraph_tpu.parallel import make_mesh
    spec = {}
    for part in args.mesh.split(","):
        k, _, v = part.partition("=")
        if k.strip() not in ("dp", "idx") or not v.strip().isdigit():
            raise SystemExit(f"--mesh expects dp=D,idx=I, got {args.mesh!r}")
        spec[k.strip()] = int(v)
    return make_mesh(**spec)


def load_dataset(args):
    from ragraph_tpu.data import load_tu_dataset, synthetic_tu_dataset
    if args.dataset == "SYNTH":
        return synthetic_tu_dataset(seed=0, num_graphs=120, num_classes=3,
                                    feat_dim=16)
    if args.dataset == "SYNTH-HARD":
        # same off-the-ceiling generator as cli.fewshot (signal 0.6,
        # noisy blocks) so a fewshot run can pretrain its encoder on
        # the matching data
        return synthetic_tu_dataset(seed=0, num_graphs=120, num_classes=3,
                                    feat_dim=16, signal=0.6, p_in=0.35,
                                    p_out=0.15, name="SYNTH-HARD")
    return load_tu_dataset(args.data_root, args.dataset)


def run_pretrain(args):
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    import optax

    from ragraph_tpu.data import flat_batches
    from ragraph_tpu.models import PrePrompt, prompt_pretrain_sample
    from ragraph_tpu.train import BestCheckpointKeeper, RunLogger
    from ragraph_tpu.utils import seed_everything

    log = RunLogger(exp_name="node-pretrain")
    _, rng = seed_everything(args.seed)
    ds = load_dataset(args)
    pad = args.batch_size * max(g.features.shape[0] for g in ds.graphs)

    model = PrePrompt(hidden=args.hidden, num_layers=args.encoder_layers)
    g0 = next(flat_batches(ds.graphs, args.batch_size, pad))
    params = model.init({"params": jr.key(args.seed),
                         "dropout": jr.key(args.seed + 1)},
                        g0.features, g0.adj,
                        jnp.zeros((pad, 3), jnp.int32), g0.node_mask,
                        method=model.init_all)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    from ragraph_tpu.models.preprompt import corrupt_features
    from ragraph_tpu.rag import make_graphcl_views
    terms = args.pretrain_loss.split("+")
    # "graphcl" == "graphcl:edge"; flavors: edge / mask / node / subgraph
    # (GraphCL.forward input wiring, models/graphcl.py:21-41)
    graphcl_flavors = [t.split(":", 1)[1] if ":" in t else "edge"
                       for t in terms if t.startswith("graphcl")]

    @jax.jit
    def step(params, opt_state, feats, adj, tuples, mask, key):
        k_drop, k_shuf, k_aug = jax.random.split(key, 3)

        def loss_fn(p):
            total = 0.0
            if "lp" in terms:
                total += model.apply(p, feats, adj, tuples, mask,
                                     rngs={"dropout": k_drop})
            if "dgi" in terms or graphcl_flavors:
                shuf = corrupt_features(k_shuf, feats, mask)
            if "dgi" in terms:
                total += model.apply(p, feats, shuf, adj, mask,
                                     method=model.dgi_loss)
            for fi, flavor in enumerate(graphcl_flavors):
                v1, v2 = make_graphcl_views(
                    jax.random.fold_in(k_aug, fi), flavor, feats, adj, mask)
                total += model.apply(p, feats, shuf, adj, v1, v2, mask,
                                     flavor=flavor,
                                     method=model.graphcl_flavor_loss)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    keeper = BestCheckpointKeeper(args.save_dir,
                                  name=f"model_{args.dataset}")
    # materialize once: rebuilding flat_batches per epoch would redo the
    # host block-diagonal assembly + (pad, pad) uploads 30x; and the raw
    # host adjacency comes WITH the batch — reconstructing it from the
    # device array (np.asarray(g.adj)) costs seconds per batch through
    # the ~100 KB/s tunnel.
    batches = list(flat_batches(ds.graphs, args.batch_size, pad,
                                with_host_adj=True))
    masks_host = [np.asarray(g.node_mask) for g, _ in batches]
    epoch_losses = []
    for epoch in range(args.pretrain_epochs):
        tot, nb = 0.0, 0
        for (g, raw_adj), mask_host in zip(batches, masks_host):
            raw = raw_adj > 0
            np.fill_diagonal(raw, False)
            tuples = jnp.asarray(prompt_pretrain_sample(
                raw.astype(np.float32), args.lp_samples, rng, mask_host))
            params, opt_state, loss = step(
                params, opt_state, g.features, g.adj, tuples, g.node_mask,
                jr.fold_in(jr.key(args.seed + 2), epoch * 1000 + nb))
            tot += float(loss)
            nb += 1
        epoch_losses.append(tot / max(nb, 1))
        log.log_loss(epoch, {"pretrain_loss": epoch_losses[-1]})
        keeper.update(-epoch_losses[-1], params)  # best (lowest) loss
    os.makedirs(args.results_dir, exist_ok=True)
    out = os.path.join(args.results_dir, f"pretrain_{args.dataset}.json")
    with open(out, "w") as f:
        json.dump({"loss_terms": terms, "epoch_losses": epoch_losses}, f,
                  indent=4)
    log(f"saved best pretrain checkpoint: {keeper.path}")
    return keeper.path


def _eval_once(args, ds, enc_params, seed_i, log, mesh=None):
    import jax.random as jr
    import optax

    from ragraph_tpu.data import flat_batches, stacked_batches
    from ragraph_tpu.models import (RAGraphGraph, RAGraphGraphConfig,
                                    RAGraphNode, RAGraphNodeConfig,
                                    GRAPH_FUSION_WEIGHTS,
                                    graph_library_config)
    from ragraph_tpu.rag import LibraryConfig

    rng = np.random.default_rng(seed_i)
    ds = ds.shuffle(rng)
    train, val, test = ds.subset(0, .5), ds.subset(.5, .8), ds.subset(.8, 1)
    pad = args.batch_size * max(g.features.shape[0] for g in ds.graphs)
    finetune = args.mode == "finetune"
    num_class = max(ds.num_node_classes, ds.num_graph_classes, 2)

    retr = dict(retrieve_dtype=args.retrieve_dtype,
                retrieve_rescore_pad=args.retrieve_rescore_pad)
    if args.level == "node":
        libcfg = LibraryConfig(level="node",
                               retrieve_num=num_class + 1,
                               toy_graph_hop=2, **retr)
        cfg = RAGraphNodeConfig(emb_size=args.hidden, num_class=num_class,
                                finetune=finetune,
                                noise_finetune=args.noise,
                                encoder_layers=args.encoder_layers,
                                library=libcfg)
        task = RAGraphNode(cfg, feature_dim=ds.num_node_attributes)
    else:
        rw, lw = GRAPH_FUSION_WEIGHTS.get(args.dataset, (0.3, 0.3))
        cfg = RAGraphGraphConfig(emb_size=args.hidden, num_class=num_class,
                                 retrieve_weight=rw, label_weight=lw,
                                 finetune=finetune,
                                 noise_finetune=args.noise,
                                 encoder_layers=args.encoder_layers,
                                 library=dataclasses.replace(
                                     graph_library_config(num_class),
                                     **retr))
        task = RAGraphGraph(cfg, feature_dim=ds.num_node_attributes)

    state = task.init_state(jr.key(seed_i), encoder_params=enc_params,
                            library_capacity=args.library_capacity)

    shard_lib = mesh is not None and int(mesh.shape["idx"]) > 1

    def _lib_batches(graphs):
        return stacked_batches(graphs, args.batch_size,
                               num_classes=num_class,
                               num_graph_classes=num_class)

    def _append(state, graphs, key):
        """Library append — on the sharded store when a >1 idx axis is
        up (shard_map compacting appends; the full store never exists on
        one device), else the single-device path."""
        if not shard_lib:
            return task.build_library(state, _lib_batches(graphs), key)
        import dataclasses as _dc

        from ragraph_tpu.parallel import build_sharded_library
        lib = build_sharded_library(
            mesh, state.library, task.encoder_fn(state.encoder_params),
            _lib_batches(graphs), cfg.library, key)
        return _dc.replace(state, library=lib)

    if mesh is not None:
        import dataclasses as _dc

        from ragraph_tpu.parallel import replicate, sharded_library_init
        lib = (sharded_library_init(mesh, args.library_capacity,
                                    cfg.emb_size, num_class,
                                    num_anchors=cfg.library.num_anchors)
               if shard_lib else state.library)
        state = _dc.replace(
            state,
            encoder_params=replicate(mesh, state.encoder_params),
            decoder_params=replicate(mesh, state.decoder_params),
            library=lib)

    state = _append(state, train.graphs, jr.key(seed_i + 1))

    if finetune:
        opt = optax.adam(args.lr)
        tstep = task.make_train_step(opt)
        opt_state = opt.init({"encoder": state.encoder_params,
                              "decoder": state.decoder_params})
        if args.level == "node":
            batches = list(flat_batches(val.graphs, args.batch_size, pad,
                                        num_classes=num_class))
        else:
            batches = list(stacked_batches(val.graphs, args.batch_size,
                                           num_classes=num_class,
                                           num_graph_classes=num_class))
        if mesh is not None:
            from ragraph_tpu.parallel import shard_batch
            batches = [shard_batch(mesh, b) for b in batches]
        for epoch in range(args.epochs):
            tot = 0.0
            for i, b in enumerate(batches):
                state, opt_state, loss = tstep(
                    state, opt_state, b,
                    jr.fold_in(jr.key(seed_i + 2), epoch * 1000 + i))
                tot += float(loss)
            if epoch % 10 == 0:
                log.log_loss(epoch, {"loss": tot / max(len(batches), 1)})

    # reference protocol: append val entries before test
    state = _append(state, val.graphs, jr.key(seed_i + 3))
    if args.level == "node":
        acc = task.accuracy(state, flat_batches(test.graphs,
                                                args.batch_size, pad,
                                                num_classes=num_class))
    else:
        acc = task.accuracy(state, stacked_batches(test.graphs,
                                                   args.batch_size,
                                                   num_classes=num_class,
                                                   num_graph_classes=num_class))
    return acc


def run_eval(args):
    import jax.random as jr

    from ragraph_tpu.models import PrePrompt
    from ragraph_tpu.train import RunLogger, restore_checkpoint
    from ragraph_tpu.utils import seed_everything

    log = RunLogger(exp_name=f"node-{args.mode}")
    seed_everything(args.seed)
    ds = load_dataset(args)

    ckpt = os.path.join(args.save_dir, f"model_{args.dataset}")
    enc_params = None
    try:
        enc_params = restore_checkpoint(ckpt, use_orbax=False)
        log(f"loaded pretrain checkpoint {ckpt}")
    except FileNotFoundError:
        log("no pretrain checkpoint found; using random encoder init")

    mesh = _make_mesh(args)
    accs = []
    for i in range(args.test_times):
        acc = _eval_once(args, ds, enc_params, i, log, mesh=mesh)
        accs.append(100.0 * acc)
        log(f"run {i + 1}/{args.test_times}: accuracy {accs[-1]:.4f}")

    mean, std = float(np.mean(accs)), float(np.std(accs))
    log(f"Mean: [{mean:.4f}]  Std: [{std:.4f}]")
    os.makedirs(args.results_dir, exist_ok=True)
    tag = "noise" if args.noise else args.mode
    out = os.path.join(args.results_dir,
                       f"{tag}_{args.level}_{args.dataset}.json")
    with open(out, "w") as f:
        json.dump({"mean": mean, "std": std, "accuracy": accs}, f, indent=4)
    log(f"results written to {out}")
    return mean


def main(argv=None):
    from ragraph_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.retrieve_rescore_pad and args.retrieve_dtype != "int8":
        parser.error("--retrieve-rescore-pad requires --retrieve-dtype "
                     "int8")  # fail fast, not at the first retrieve trace
    if args.mode == "pretrain":
        return run_pretrain(args)
    return run_eval(args)


if __name__ == "__main__":
    main()
