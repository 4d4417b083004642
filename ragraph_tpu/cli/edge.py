"""Edge (recsys) CLI drivers.

Reference entry points replaced:
- ``RAGraph_edge/pretrain.py`` → ``python -m ragraph_tpu.cli.edge pretrain``
- ``RAGraph_edge/finetune_rag.py`` → ``... finetune``
- ``RAGraph_edge/finetune_noise.py`` → ``... finetune --noise``
- ``RAGraph_edge/vanilla_ragraph.py`` → ``... vanilla``

Dataset layout (reference ``finetune_rag.py:40-47``): ``<data>/pretrain.txt``,
``pretrain_val.txt``, ``fine_tune.txt``, ``test_1.txt..test_N.txt``
(N=8 for amazon else 4). ``--dataset SYNTH`` runs on generated data.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("ragraph_tpu.edge")
    p.add_argument("mode", choices=["pretrain", "finetune", "vanilla"])
    p.add_argument("--data-path", default="SYNTH")
    p.add_argument("--model", default="RAGraph",
                   choices=["RAGraph", "GraphPro", "LightGCN", "SGL",
                            "SimGCL", "MixGCF", "GP",
                            "roland", "evolvegcn_h", "evolvegcn_o"])
    p.add_argument("--dynamic", default=None,
                   choices=["roland", "evolvegcn_h", "evolvegcn_o"],
                   help="cross a plugin --model with a dynamic-GNN "
                        "evolution (modules/dynamicGNN/plugin_dynamic/"
                        "{SGL,SimGCL,MixGCF}_dynamic.py crosses)")
    p.add_argument("--prompt", default=None,
                   choices=["graphprompt", "gpf"],
                   help="cross a plugin --model with a prompt vector "
                        "(modules/graphprompt/plugin_gp/*_gp.py crosses); "
                        "with --model GP selects the prompt mode itself "
                        "(the reference's --f_model graphprompt|gpf)")
    p.add_argument("--noise", action="store_true")
    p.add_argument("--retrieve-dtype", choices=["input", "int8"],
                   default="input",
                   help="int8: double-rate MXU scoring for the RAG "
                        "retrieval (see EdgeModelConfig.retrieve_dtype)")
    p.add_argument("--selection-dtype", choices=["f32", "bf16"],
                   default="f32",
                   help="bf16: half-width radix k-th selection for the "
                        "huge-k vanilla fusion, ~2x end-to-end at half "
                        "the temp memory (see "
                        "EdgeModelConfig.selection_dtype)")
    p.add_argument("--lora", default="off", choices=["off", "zero", "svd"],
                   help="LoRA adapters on the RAGraph finetune tables: "
                        "off (default — beats both LoRA variants on real "
                        "amazon, see EdgeModelConfig.use_lora), zero "
                        "(zero-delta init, trained factors — classic "
                        "LoRA), svd (strict reference-driver parity: SVD "
                        "init, modules/RAGraph.py:122-160, with FROZEN "
                        "A/B factors — the reference's optimizer never "
                        "sees them, utils/trainer.py:19-21)")
    p.add_argument("--lbd", type=float, default=None,
                   help="CL loss weight for the SGL/SimGCL plugins "
                        "(reference parse_args_sgl: 0.1, "
                        "parse_args_simgcl: 0.5; default: config's 0.1)")
    p.add_argument("--eps", type=float, default=None,
                   help="SimGCL perturbation magnitude "
                        "(parse_args_simgcl default 0.1)")
    p.add_argument("--n-negs", type=int, default=None,
                   help="MixGCF candidate negatives per positive "
                        "(parse_args_mixgcf default 16)")
    p.add_argument("--emb-size", type=int, default=64)
    p.add_argument("--num-layers", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=2048)
    p.add_argument("--edge-dropout", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--hour-interval", type=float, default=1.0)
    p.add_argument("--updt-inter", type=int, default=1)
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("--save-dir", default="saved")
    p.add_argument("--pre-model-path", default=None,
                   help="pretrained checkpoint (embeddings) to load")
    p.add_argument("--stage-ckpt-dir", default=None,
                   help="checkpoint the staged loop's state after every "
                        "stage (atomic; survives crashes/preemption)")
    p.add_argument("--resume", action="store_true",
                   help="with --stage-ckpt-dir: continue after the last "
                        "completed stage; bit-equal to an uninterrupted "
                        "run (tests/test_staged_resume.py)")
    p.add_argument("--mesh", default=None, metavar="dp=D,idx=I",
                   help="multi-chip layout: batches shard over dp (XLA "
                        "inserts the gradient all-reduce); idx>1 "
                        "row-shards the embedding tables and runs the "
                        "receiver-range shard_map propagation "
                        "(parallel/edge_sharded.py). idx>1 requires a "
                        "base model (RAGraph/GraphPro/LightGCN). "
                        "dp*idx must equal the device count.")
    return p


def _make_mesh(args):
    """Parse ``--mesh dp=D,idx=I`` into a Mesh (None if unset)."""
    if not args.mesh:
        return None
    from ragraph_tpu.parallel import make_mesh
    spec = {}
    for part in args.mesh.split(","):
        k, _, v = part.partition("=")
        if k.strip() not in ("dp", "idx") or not v.strip().isdigit():
            raise SystemExit(f"--mesh expects dp=D,idx=I, got {args.mesh!r}")
        spec[k.strip()] = int(v)
    mesh = make_mesh(**spec)
    if int(mesh.shape["idx"]) > 1 and (
            args.model not in ("RAGraph", "GraphPro", "LightGCN")
            or args.dynamic or args.prompt):
        raise SystemExit(
            "--mesh with idx>1 (sharded tables + shard_map propagation) "
            "supports the base models RAGraph/GraphPro/LightGCN; use a "
            "dp-only mesh for the plugin/dynamic/prompt baselines")
    return mesh


DYNAMIC_MODELS = ("roland", "evolvegcn_h", "evolvegcn_o")


def _model_cls(args_or_name):
    """Resolve --model (+ optional --dynamic / --prompt crosses) to a
    class — the full baseline zoo the reference launches by name
    (``RAGraph_edge/pretrain.py:22-28``, crosses via
    ``modules/dynamicGNN/build_on_plugin.py`` /
    ``modules/graphprompt/plugin_gp``)."""
    from ragraph_tpu.models.edge import (EvolveGCNH, EvolveGCNO,
                                         GraphPro, GraphPromptEdge,
                                         LightGCNEdge, MixGCFPlugin,
                                         RAGraphEdge, Roland, SGLPlugin,
                                         SimGCLPlugin, make_dynamic,
                                         make_prompted)
    if isinstance(args_or_name, str):
        name, dynamic, prompt = args_or_name, None, None
    else:
        name = args_or_name.model
        dynamic = getattr(args_or_name, "dynamic", None)
        prompt = getattr(args_or_name, "prompt", None)
    cls = {"RAGraph": RAGraphEdge, "GraphPro": GraphPro,
           "LightGCN": LightGCNEdge, "SGL": SGLPlugin,
           "SimGCL": SimGCLPlugin, "MixGCF": MixGCFPlugin,
           "GP": GraphPromptEdge, "roland": Roland,
           "evolvegcn_h": EvolveGCNH, "evolvegcn_o": EvolveGCNO}[name]
    if dynamic is not None:
        if name not in ("SGL", "SimGCL", "MixGCF"):
            raise SystemExit(f"--dynamic requires a plugin model "
                             f"(SGL/SimGCL/MixGCF), got {name}")
        cls = make_dynamic(cls, dynamic)
    if prompt is not None:
        if name == "GP":
            # plain GP takes the prompt MODE directly (the reference's
            # --f_model graphprompt|gpf switch, graphprompt/GP.py:25-30)
            import functools
            return functools.partial(GraphPromptEdge, prompt_mode=prompt)
        if name not in ("SGL", "SimGCL", "MixGCF", "LightGCN"):
            raise SystemExit(f"--prompt requires a plugin model, got {name}")
        if name == "LightGCN":
            # LightGCNEdge's forward never calls _propagated (it has its
            # own fused propagation), so graphprompt's hook would be a
            # silent no-op (zero prompt gradient). The plugin-flavor
            # LightGCN (plugins/LightGCN.py:20) uses the PluginBase
            # engine whose forward routes through _propagated — that is
            # the class the prompt crosses must wrap.
            from ragraph_tpu.models.edge import LightGCNPlugin
            cls = LightGCNPlugin
        cls = make_prompted(cls, prompt)
    return cls


def _is_dynamic(args):
    return args.model in DYNAMIC_MODELS or args.dynamic is not None


def _dynamic_mode(args):
    return args.model if args.model in DYNAMIC_MODELS else args.dynamic


def _load_rows(args):
    """Returns ``(train, val, finetune, stages)``. ``val`` is the
    pretrain validation split (``pretrain_val.txt``): the reference
    evaluates pretraining against it (``pretrain.py:53-62``) AND sizes
    the id space from ``EdgeListData(pretrain, pretrain_val)``
    (``utils/dataloader.py:107-111``) — both need it separately from
    ``fine_tune.txt``."""
    if args.data_path == "SYNTH":
        from ragraph_tpu.data import synthetic_edge_stream
        train, stages = synthetic_edge_stream(seed=0, num_users=64,
                                              num_items=128, num_stages=5)
        # hold out the first generated stage as the pretrain val split
        # (mirrors pretrain.txt / pretrain_val.txt being disjoint)
        return train, stages[0], stages[0], stages[1:]
    from ragraph_tpu.data import parse_edge_file
    base = args.data_path
    n = 8 if os.path.basename(base) == "amazon" else 4
    train = parse_edge_file(os.path.join(base, "pretrain.txt"))
    val_path = os.path.join(base, "pretrain_val.txt")
    finetune = parse_edge_file(os.path.join(base, "fine_tune.txt"))
    val = parse_edge_file(val_path) if os.path.exists(val_path) else finetune
    stages = [parse_edge_file(os.path.join(base, f"test_{i}.txt"))
              for i in range(1, n + 1)]
    return train, val, finetune, stages


def _cfg(args, phase, dataset_name, num_nodes=None):
    from ragraph_tpu.models.edge import edge_config_for
    lora = getattr(args, "lora", "off")
    # plugin-zoo knobs: only override the config defaults when given
    extra = {k: v for k, v in (("lbd", getattr(args, "lbd", None)),
                               ("eps", getattr(args, "eps", None)),
                               ("n_negs", getattr(args, "n_negs", None)))
             if v is not None}
    return edge_config_for(
        dataset_name, phase, num_nodes=num_nodes,
        emb_size=args.emb_size, num_layers=args.num_layers,
        edge_dropout=args.edge_dropout, lr=args.lr,
        num_epochs=args.epochs, early_stop_patience=args.patience,
        use_noise=args.noise,
        use_lora=lora != "off",
        lora_init_scale=1.0 if lora == "svd" else 0.0,
        # "svd" is the strict-reference arm: the reference's optimizer
        # never updates the factors (plain tensors, not nn.Parameters —
        # EdgeModelConfig.lora_train_factors), so freeze them there;
        # "zero" is classic trained LoRA.
        lora_train_factors=lora != "svd",
        retrieve_dtype=getattr(args, "retrieve_dtype", "input"),
        selection_dtype=getattr(args, "selection_dtype", "f32"),
        batch_size=args.batch_size, **extra)


def run_pretrain(args):
    import jax.random as jr

    from ragraph_tpu.data import load_edge_dataset
    from ragraph_tpu.models.edge import EdgeGraphArrays
    from ragraph_tpu.train import (BestCheckpointKeeper, EdgeTrainer,
                                   RunLogger)
    from ragraph_tpu.utils import seed_everything

    log = RunLogger(save_dir=args.save_dir, exp_name="edge-pretrain")
    _, rng = seed_everything(args.seed)
    train_rows, val_rows, _, _ = _load_rows(args)
    ds = load_edge_dataset(train_rows,
                           [(u, i) for (u, i, *_) in val_rows],
                           hour_interval=args.hour_interval)
    name = os.path.basename(args.data_path)
    cfg = _cfg(args, "pretrain", name)
    # dynamic/prompted baselines are finetune-stage wrappers in the
    # reference; their pretrain tables come from the plain base model
    # (parse_args.py --pre_model)
    pre_cls = (_model_cls(args.model)
               if args.model not in DYNAMIC_MODELS else _model_cls("GraphPro"))
    mesh = _make_mesh(args)
    arrays = EdgeGraphArrays.from_dataset(ds)
    if mesh is not None and int(mesh.shape["idx"]) > 1:
        arrays = arrays.with_sharding(int(mesh.shape["idx"]))
    model = pre_cls(cfg, arrays, phase="pretrain", mesh=mesh)
    params = model.init_params(jr.key(args.seed))
    trainer = EdgeTrainer(model, ds, logger=log, mesh=mesh)
    result = trainer.train(params, jr.key(args.seed + 1), rng=rng)
    keeper = BestCheckpointKeeper(args.save_dir,
                                  name=f"pretrain_{args.model}_{name}")
    keeper.update(float(result.best_perform["recall"][0]),
                  {"user_embedding": np.asarray(
                      result.best_params["user_embedding"]),
                   "item_embedding": np.asarray(
                      result.best_params["item_embedding"])})
    log(f"best recall {result.best_perform['recall'][0]:.5f}; "
        f"checkpoint {keeper.path}")
    out = os.path.join(args.save_dir, f"pretrain_{args.model}_{name}.json")
    with open(out, "w") as f:
        json.dump({"best_recall": float(result.best_perform["recall"][0]),
                   "best_ndcg": float(result.best_perform["ndcg"][0])},
                  f, indent=2)
    return keeper.path


def run_finetune(args):
    import jax.random as jr

    from ragraph_tpu.models.edge import staged_dynamic, staged_finetune
    from ragraph_tpu.train import RunLogger, restore_checkpoint
    from ragraph_tpu.utils import seed_everything

    if args.resume and not args.stage_ckpt_dir:
        raise SystemExit("--resume needs --stage-ckpt-dir (nowhere to "
                         "load the staged state from)")

    log = RunLogger(save_dir=args.save_dir, exp_name="edge-finetune")
    seed_everything(args.seed)
    train_rows, val_rows, ft_rows, stage_rows = _load_rows(args)
    name = os.path.basename(args.data_path)

    if args.pre_model_path:
        if args.pre_model_path.endswith(".pt"):
            # reference-format torch checkpoint
            # (utils/parse_args.py:18 pretrained_weights/*.pt)
            from ragraph_tpu.train import tables_from_torch
            tables = tables_from_torch(args.pre_model_path)
        else:
            tables = restore_checkpoint(args.pre_model_path,
                                        use_orbax=False)
    else:
        default = os.path.join(args.save_dir,
                               f"pretrain_{args.model}_{name}")
        try:
            tables = restore_checkpoint(default, use_orbax=False)
            log(f"loaded pretrain tables from {default}")
        except FileNotFoundError:
            log("no pretrain checkpoint; running pretrain first")
            run_pretrain(args)
            tables = restore_checkpoint(default, use_orbax=False)

    mesh = _make_mesh(args)
    if _is_dynamic(args):
        # ROLAND / EvolveGCN-H/-O (and their plugin crosses) use the
        # reference's dynamic staged driver (trainer_roland.py): rebuild
        # per stage, carry embeddings, ROLAND EMA-merges the meta model.
        result = staged_dynamic(
            train_rows, ft_rows, stage_rows, tables,
            cfg_factory=lambda phase: _cfg(args, phase, name),
            key=jr.key(args.seed), model_cls=_model_cls(args),
            mode=_dynamic_mode(args), hour_interval=args.hour_interval,
            num_epochs=args.epochs, logger=log, mesh=mesh,
            val_rows=val_rows, checkpoint_dir=args.stage_ckpt_dir,
            resume=args.resume)
    else:
        result = staged_finetune(
            train_rows, ft_rows, stage_rows, tables,
            cfg_factory=lambda phase: _cfg(args, phase, name),
            key=jr.key(args.seed), hour_interval=args.hour_interval,
            updt_inter=args.updt_inter, num_epochs=args.epochs, logger=log,
            model_cls=_model_cls(args), mesh=mesh, val_rows=val_rows,
            checkpoint_dir=args.stage_ckpt_dir, resume=args.resume)
    log(f"recalls: {result.recalls}")
    log(f"ndcgs:   {result.ndcgs}")
    log(f"avg recall {result.avg_recall:.5f} avg ndcg {result.avg_ndcg:.5f}")
    tag = args.model
    if args.dynamic:
        tag += f"-{args.dynamic}"
    if args.prompt:
        tag += f"-{args.prompt}"
    out = os.path.join(args.save_dir, f"finetune_{tag}_{name}.json")
    with open(out, "w") as f:
        json.dump({"recalls": result.recalls, "ndcgs": result.ndcgs,
                   "avg_recall": result.avg_recall,
                   "avg_ndcg": result.avg_ndcg}, f, indent=2)
    return result


def run_vanilla(args):
    """Training-free staged eval (``vanilla_ragraph.py:49-105``)."""
    import jax.random as jr

    from ragraph_tpu.data import load_edge_dataset, merge_rows
    from ragraph_tpu.models.edge import EdgeGraphArrays, RAGraphEdge
    from ragraph_tpu.train import (RankingEvaluator, RunLogger,
                                   restore_checkpoint)
    from ragraph_tpu.utils import seed_everything

    log = RunLogger(save_dir=args.save_dir, exp_name="edge-vanilla")
    seed_everything(args.seed)
    train_rows, _, ft_rows, stage_rows = _load_rows(args)
    name = os.path.basename(args.data_path)
    default = os.path.join(args.save_dir, f"pretrain_{args.model}_{name}")
    tables = restore_checkpoint(default, use_orbax=False)

    import jax.numpy as jnp
    all_rows = [train_rows, ft_rows, *stage_rows]
    recalls, ndcgs = [], []
    ev = RankingEvaluator(ks=(20,))
    mesh = _make_mesh(args)
    for stage in range(1, len(stage_rows) + 1):
        prompt_rows = merge_rows(all_rows[: stage + 1])
        ds = load_edge_dataset(prompt_rows, stage_rows[stage - 1],
                               hour_interval=args.hour_interval)
        cfg = _cfg(args, "vanilla", name, num_nodes=ds.num_nodes)
        arrays = EdgeGraphArrays.from_dataset(ds)
        if mesh is not None and int(mesh.shape["idx"]) > 1:
            arrays = arrays.with_sharding(int(mesh.shape["idx"]))
        model = RAGraphEdge(cfg, arrays, phase="vanilla", mesh=mesh)
        params = {"user_embedding": jnp.asarray(tables["user_embedding"]),
                  "item_embedding": jnp.asarray(tables["item_embedding"])}
        if mesh is not None and int(mesh.shape["idx"]) > 1:
            from ragraph_tpu.parallel import shard_rows
            params = {k: shard_rows(mesh, v) for k, v in params.items()}
        # jit both generates: the eager path dispatches propagation +
        # RAG fusion op-by-op and keeps every intermediate live at once
        # (the (N, k, E) retrieval gather alone is gigabytes at real
        # scale) — same as experiments/amazon_real.py's vanilla driver
        import jax
        u0, i0 = jax.jit(model.generate)(params)
        model.make_resource_graph(u0, i0, jr.key(stage))
        del u0, i0
        user_emb, item_emb = jax.jit(model.generate)(params)
        result = ev.evaluate(user_emb, item_emb, ds.test_user_dict,
                             ds.user_hist_dict)
        del user_emb, item_emb
        model.resource_keys = model.resource_values = None
        recalls.append(float(result["recall"][0]))
        ndcgs.append(float(result["ndcg"][0]))
        log(f"stage {stage}: recall={recalls[-1]:.5f} ndcg={ndcgs[-1]:.5f}")
    log(f"avg recall {np.mean(recalls):.5f} avg ndcg {np.mean(ndcgs):.5f}")
    return recalls, ndcgs


def main(argv=None):
    from ragraph_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    if args.mode == "pretrain":
        return run_pretrain(args)
    if args.mode == "vanilla":
        return run_vanilla(args)
    return run_finetune(args)


if __name__ == "__main__":
    main()
