"""Load the ACTUAL reference torch modules for differential parity tests.

The reference at ``/root/reference`` is pure torch, but three things block a
plain import on this box:

- ``.cuda()`` calls hardcoded in the math paths (CPU-only torch here) —
  patched to no-ops;
- dead imports in ``RAGraph_node/models/__init__.py:7-10`` (GAT/GCN/GIN/
  GraphSAGE files do not exist) — bypassed with a synthetic package whose
  ``__path__`` points at the real directory;
- the edge package's import-time ``utils.parse_args.args`` argparse
  singleton and the uninstalled ``torch_scatter`` — replaced with a fake
  ``args`` namespace and a faithful pure-torch ``scatter_softmax``.

Only loading *scaffolding* lives here. Every formula under test executes the
reference's own code objects.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import textwrap
import types
from types import SimpleNamespace

import torch

REF = "/root/reference"
NODE = f"{REF}/RAGraph_node"
EDGE = f"{REF}/RAGraph_edge"

_CACHE = {}


def _patch_cuda():
    """Make ``.cuda()`` a no-op (reference hardcodes it, torch here is CPU)."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def _load_file(unique_name: str, path: str):
    spec = importlib.util.spec_from_file_location(unique_name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _scatter_softmax(src: torch.Tensor, index: torch.Tensor, dim: int = 0,
                     dim_size: int | None = None) -> torch.Tensor:
    """Faithful pure-torch stand-in for ``torch_scatter.scatter_softmax``
    on a 1-D ``src``: softmax within each ``index`` segment."""
    if dim_size is None:
        dim_size = int(index.max()) + 1
    neg_inf = torch.full((dim_size,), float("-inf"), dtype=src.dtype)
    seg_max = neg_inf.scatter_reduce(0, index, src, reduce="amax",
                                     include_self=True)
    seg_max = torch.where(torch.isfinite(seg_max), seg_max,
                          torch.zeros_like(seg_max))
    ex = torch.exp(src - seg_max[index])
    denom = torch.zeros(dim_size, dtype=src.dtype).scatter_add(0, index, ex)
    return ex / denom[index]


def _purge(prefixes):
    for name in list(sys.modules):
        if any(name == p or name.startswith(p + ".") for p in prefixes):
            del sys.modules[name]


def _load_node(ns: SimpleNamespace):
    """RAGraph_node: the ragraph_utils package (loaded under a synthetic
    parent so its relative imports resolve) + the models/layers packages
    (rebuilt without the dead imports) + preprompt."""
    rgu = types.ModuleType("refnode_rgu")
    rgu.__path__ = [f"{NODE}/ragraph_utils"]
    sys.modules["refnode_rgu"] = rgu
    # ToyGraphBase imports torch_geometric (not installed) only for its
    # TUDataset/DataLoader loader method; stub the two names so the
    # pure-torch build/retrieve methods are importable for parity tests.
    tg = types.ModuleType("torch_geometric")
    tg_loader = types.ModuleType("torch_geometric.loader")
    tg_loader.DataLoader = object
    tg_data = types.ModuleType("torch_geometric.datasets")
    tg_data.TUDataset = object
    tg.loader, tg.datasets = tg_loader, tg_data
    had_tg = "torch_geometric" in sys.modules
    sys.modules.setdefault("torch_geometric", tg)
    sys.modules.setdefault("torch_geometric.loader", tg_loader)
    sys.modules.setdefault("torch_geometric.datasets", tg_data)
    try:
        for name in ("Propagation", "SimilarityFunctions",
                     "PositionAwareEncoder", "InverseSampling",
                     "Augmentation", "TaskDecoder", "ToyGraphBase"):
            mod = importlib.import_module(f"refnode_rgu.{name}")
            setattr(ns, f"node_{name}", getattr(mod, name))
        ns.node_utility = importlib.import_module("refnode_rgu.utility")
    finally:
        _purge(["refnode_rgu"])
        if not had_tg:
            _purge(["torch_geometric"])
    # graph-level and fewshot ToyGraphBase variants (same loading recipe,
    # different source trees; used by the variant build/retrieve parity
    # tests)
    for prefix, tree in (("graph", f"{REF}/RAGraph_graph"),
                         ("fewshot", f"{REF}/RAGraph_node_fewshot"),
                         ("gfewshot", f"{REF}/RAGraph_graph_fewshot")):
        pkg_name = f"ref{prefix}_rgu"
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [f"{tree}/ragraph_utils"]
        sys.modules[pkg_name] = pkg
        sys.modules.setdefault("torch_geometric", tg)
        sys.modules.setdefault("torch_geometric.loader", tg_loader)
        sys.modules.setdefault("torch_geometric.datasets", tg_data)
        try:
            mod = importlib.import_module(f"{pkg_name}.ToyGraphBase")
            setattr(ns, f"{prefix}_ToyGraphBase", mod.ToyGraphBase)
            # the variant's top-level RAGraph model (imports
            # `from ragraph_utils import ...` absolutely)
            prop_mod = importlib.import_module(f"{pkg_name}.Propagation")
            rgu_alias = types.ModuleType("ragraph_utils")
            rgu_alias.ToyGraphBase = mod.ToyGraphBase
            rgu_alias.Propagation = prop_mod.Propagation
            for extra in ("TaskDecoder", "FewShotBase"):
                try:
                    em = importlib.import_module(f"{pkg_name}.{extra}")
                    setattr(rgu_alias, extra, getattr(em, extra))
                except (ImportError, AttributeError):
                    pass
            sys.modules["ragraph_utils"] = rgu_alias
            try:
                rag_mod = _load_file(f"ref{prefix}_RAGraph",
                                     f"{tree}/RAGraph.py")
                setattr(ns, f"{prefix}_RAGraph", rag_mod.RAGraph)
            except Exception:  # noqa: BLE001 — variant tree may differ
                pass
        finally:
            _purge([pkg_name, "ragraph_utils"])
            if not had_tg:
                _purge(["torch_geometric"])

    ns.node_process = _load_file("refnode_process", f"{NODE}/utils/process.py")
    ns.node_aug = _load_file("refnode_aug", f"{NODE}/aug.py")

    saved_path = list(sys.path)
    sys.path.insert(0, NODE)
    try:
        layers = types.ModuleType("layers")
        layers.__path__ = [f"{NODE}/layers"]
        sys.modules["layers"] = layers
        import layers.discriminator  # noqa: F401
        import layers.discriminator2  # noqa: F401
        import layers.gcn  # noqa: F401
        import layers.readout  # noqa: F401
        layers.GCN = layers.gcn.GCN
        layers.AvgReadout = layers.readout.AvgReadout
        layers.Discriminator = layers.discriminator.Discriminator
        layers.Discriminator2 = layers.discriminator2.Discriminator2

        models = types.ModuleType("models")
        models.__path__ = [f"{NODE}/models"]
        sys.modules["models"] = models
        import models.LP  # noqa: F401
        import models.dgi  # noqa: F401
        import models.graphcl  # noqa: F401
        import models.logreg  # noqa: F401
        models.DGI = models.dgi.DGI
        models.GraphCL = models.graphcl.GraphCL
        models.Lp = models.LP.Lp
        models.LogReg = models.logreg.LogReg
        import models.gcnlayers  # noqa: F401  (needs the attrs above)
        models.GcnLayers = models.gcnlayers.GcnLayers

        import preprompt as node_preprompt  # noqa: F401

        # the top-level RAGraph model (ToyGraphBase retrieve + fusion);
        # needs `from ragraph_utils import ...` and `from utils import
        # process` resolvable, plus the torch_geometric stub above
        sys.modules.setdefault("torch_geometric", tg)
        sys.modules.setdefault("torch_geometric.loader", tg_loader)
        sys.modules.setdefault("torch_geometric.datasets", tg_data)
        import RAGraph as node_RAGraph_mod  # noqa: F401
        ns.node_RAGraph = node_RAGraph_mod.RAGraph

        ns.node_GCN = layers.GCN
        ns.node_AvgReadout = layers.AvgReadout
        ns.node_Discriminator = layers.Discriminator
        ns.node_DGI = models.DGI
        ns.node_GraphCL = models.GraphCL
        ns.node_Lp = models.Lp
        ns.node_GcnLayers = models.GcnLayers
        ns.node_preprompt = node_preprompt
    finally:
        sys.path[:] = saved_path
        _purge(["layers", "models", "preprompt", "RAGraph", "utils"])


def make_edge_args(**overrides) -> SimpleNamespace:
    """The attributes of the ``parse_args.args`` singleton that the edge
    modules under test read (``RAGraph_edge/utils/parse_args.py:3-96``)."""
    args = SimpleNamespace(
        device="cpu", emb_size=32, num_layers=3, weight_decay=1e-4,
        edge_dropout=0.1, emb_dropout=0.0, metrics="recall;ndcg;precision",
        metrics_k="3;5", eval_batch_size=3, data_path="/tmp",
        pre_model_path="/tmp/none.pt", exp_name="parity", log=0,
        seed=2023, lr=1e-3, batch_size=2048, num_epochs=1, neg_num=1,
        updt_inter=1, samp_decay=0.05, ab="full", hour_interval_pre=1.0,
        hour_interval_f=1, model="RAGraph", desc="", phase="pretrain",
        plugin=False, save_path="saved", save_dir="saved",
        edge_dropout_ft=0.1, use_noise=False,
        # plugin-zoo knobs (parse_args.py:49-63: parse_args_sgl temp/lbd,
        # parse_args_simgcl eps [lbd=0.5 — set per-arm], parse_args_mixgcf
        # n_negs)
        temp=0.2, lbd=0.1, eps=0.1, n_negs=16,
    )
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def _load_edge(ns: SimpleNamespace):
    """RAGraph_edge: modules.utils / base_model / RAGraph + utils.metrics,
    with faked ``utils.parse_args`` and ``torch_scatter``."""
    ns.edge_InverseSampling = _load_file(
        "refedge_InverseSampling",
        f"{EDGE}/modules/ragraph_utils/InverseSampling.py").InverseSampling

    saved_path = list(sys.path)
    sys.path.insert(0, EDGE)
    try:
        ts = types.ModuleType("torch_scatter")
        ts.scatter_softmax = _scatter_softmax
        sys.modules["torch_scatter"] = ts

        utils_pkg = types.ModuleType("utils")
        utils_pkg.__path__ = [f"{EDGE}/utils"]
        sys.modules["utils"] = utils_pkg
        parse_args = types.ModuleType("utils.parse_args")
        parse_args.args = make_edge_args()
        sys.modules["utils.parse_args"] = parse_args
        utils_pkg.parse_args = parse_args

        modules_pkg = types.ModuleType("modules")
        modules_pkg.__path__ = [f"{EDGE}/modules"]
        sys.modules["modules"] = modules_pkg

        import modules.RAGraph  # noqa: F401
        import modules.base_model  # noqa: F401
        import modules.utils  # noqa: F401
        import utils.metrics  # noqa: F401
        # full driver-protocol pieces (e2e differential): loader,
        # trainer, the GraphPro pretrain backbone, merge_pd
        import modules.GraphPro  # noqa: F401
        import utils.dataloader  # noqa: F401
        import utils.trainer  # noqa: F401
        graphprompt_pkg = types.ModuleType("modules.graphprompt")
        graphprompt_pkg.__path__ = [f"{EDGE}/modules/graphprompt"]
        sys.modules["modules.graphprompt"] = graphprompt_pkg
        modules_pkg.graphprompt = graphprompt_pkg
        parse_args.args.f_model = "graphprompt"
        gp_mod = importlib.import_module("modules.graphprompt.GP")
        graphprompt_pkg.GP = gp_mod
        pgp_pkg = types.ModuleType("modules.graphprompt.plugin_gp")
        pgp_pkg.__path__ = [f"{EDGE}/modules/graphprompt/plugin_gp"]
        sys.modules["modules.graphprompt.plugin_gp"] = pgp_pkg
        graphprompt_pkg.plugin_gp = pgp_pkg
        sgl_gp_mod = importlib.import_module(
            "modules.graphprompt.plugin_gp.SGL_gp")

        # plugin + dynamic zoo (r4 verdict item 2: zoo e2e differentials)
        plugins_pkg = types.ModuleType("modules.plugins")
        plugins_pkg.__path__ = [f"{EDGE}/modules/plugins"]
        sys.modules["modules.plugins"] = plugins_pkg
        modules_pkg.plugins = plugins_pkg
        sgl_mod = importlib.import_module("modules.plugins.SGL")
        simgcl_mod = importlib.import_module("modules.plugins.SimGCL")
        mixgcf_mod = importlib.import_module("modules.plugins.MixGCF")
        dyn_pkg = types.ModuleType("modules.dynamicGNN")
        dyn_pkg.__path__ = [f"{EDGE}/modules/dynamicGNN"]
        sys.modules["modules.dynamicGNN"] = dyn_pkg
        modules_pkg.dynamicGNN = dyn_pkg
        roland_mod = importlib.import_module("modules.dynamicGNN.roland")
        egh_mod = importlib.import_module("modules.dynamicGNN.evolveGCN_H")
        ego_mod = importlib.import_module("modules.dynamicGNN.evolveGCN_O")
        pdyn_pkg = types.ModuleType("modules.dynamicGNN.plugin_dynamic")
        pdyn_pkg.__path__ = [f"{EDGE}/modules/dynamicGNN/plugin_dynamic"]
        sys.modules["modules.dynamicGNN.plugin_dynamic"] = pdyn_pkg
        dyn_pkg.plugin_dynamic = pdyn_pkg
        sgl_dyn_mod = importlib.import_module(
            "modules.dynamicGNN.plugin_dynamic.SGL_dynamic")
        simgcl_dyn_mod = importlib.import_module(
            "modules.dynamicGNN.plugin_dynamic.SimGCL_dynamic")
        mixgcf_dyn_mod = importlib.import_module(
            "modules.dynamicGNN.plugin_dynamic.MixGCF_dynamic")
        trainer_roland_mod = importlib.import_module(
            "modules.dynamicGNN.trainer_roland")

        ns.edge_SGL = sgl_mod.SGL
        ns.edge_SimGCL = simgcl_mod.SimGCL
        ns.edge_MixGCF = mixgcf_mod.MixGCF
        ns.edge_roland = roland_mod.roland
        ns.edge_evolveGCN_H = egh_mod.evolveGCN_H
        ns.edge_evolveGCN_O = ego_mod.evolveGCN_O
        ns.edge_SGL_roland = sgl_dyn_mod.SGL_roland
        ns.edge_SimGCL_roland = simgcl_dyn_mod.SimGCL_roland
        ns.edge_SimGCL_evolveGCN_H = simgcl_dyn_mod.SimGCL_evolveGCN_H
        ns.edge_SGL_gp = sgl_gp_mod.SGL
        ns.edge_MixGCF_evolveGCN_O = mixgcf_dyn_mod.MixGCF_evolveGCN_O
        ns.edge_average_state_dict = roland_mod.average_state_dict
        ns.edge_TrainerRoland = trainer_roland_mod.Trainer

        ns.edge_args = parse_args.args  # live: mutate to steer the modules
        ns.edge_utils = modules.utils
        ns.edge_BaseModel = modules.base_model.BaseModel
        ns.edge_RAGraph = modules.RAGraph.RAGraph
        ns.edge_GP = modules.graphprompt.GP.GP
        ns.edge_Metric = utils.metrics.Metric
        ns.edge_GraphPro = modules.GraphPro.GraphPro
        ns.edge_EdgeListData = utils.dataloader.EdgeListData
        ns.edge_Trainer = utils.trainer.Trainer
        ns.edge_merge_pd = _load_file("refedge_utility",
                                      f"{EDGE}/utility.py").merge_pd
    finally:
        sys.path[:] = saved_path
        _purge(["torch_scatter", "utils", "modules"])


def interpolative_merge_reference(all_state_dict: list, interval: int,
                                  device: str = "cpu") -> dict:
    """Execute the reference's inline interpolative-update block
    (``RAGraph_edge/finetune_rag.py:70-86``) on the given state dicts."""
    import torch.nn.functional as F
    with open(f"{EDGE}/finetune_rag.py") as f:
        lines = f.read().splitlines()
    block = textwrap.dedent("\n".join(lines[69:86]))  # 1-indexed 70..86
    assert "interpolative_weight" in block and "F.normalize" in block, \
        "finetune_rag.py drifted; update the line span"
    scope = {"torch": torch, "F": F, "args": SimpleNamespace(device=device),
             "all_state_dict": all_state_dict, "interval": interval}
    exec(block, scope)  # noqa: S102 — reference code under test
    return scope["state_dict"]


def _load_tree_driver(ns: SimpleNamespace, prefix: str, tree: str):
    """Load a variant tree's DRIVER stack (what its pretrain.py +
    finetune-rag.py read beyond the RAGraph/ToyGraphBase classes):
    ``utils/process.py``, ``aug.py``, ``ragraph_utils/utility.py``, and
    ``preprompt.py`` with the tree's OWN models/layers packages (each
    variant tree ships its own copies with diverging signatures — e.g.
    the fewshot GcnLayers.forward drops the ``sparse`` arg). Results land
    on ``ns`` as ``{prefix}_process`` / ``{prefix}_aug`` /
    ``{prefix}_utility`` / ``{prefix}_preprompt``."""
    setattr(ns, f"{prefix}_process",
            _load_file(f"ref{prefix}_process", f"{tree}/utils/process.py"))
    setattr(ns, f"{prefix}_aug",
            _load_file(f"ref{prefix}_aug", f"{tree}/aug.py"))
    setattr(ns, f"{prefix}_utility",
            _load_file(f"ref{prefix}_utility",
                       f"{tree}/ragraph_utils/utility.py"))
    # the graph-fewshot tree's __init__ imports its fewshot helpers from
    # ragraph_utils/fewshot_utility.py — a file ABSENT from the snapshot
    # (the package is unimportable as shipped); the node-fewshot tree has
    # the same helpers inside utility.py, which stands in for drivers
    import os as _os
    fsu = f"{tree}/ragraph_utils/fewshot_utility.py"
    if _os.path.exists(fsu):
        setattr(ns, f"{prefix}_fewshot_utility",
                _load_file(f"ref{prefix}_fewshot_utility", fsu))

    saved_path = list(sys.path)
    sys.path.insert(0, tree)
    try:
        layers = types.ModuleType("layers")
        layers.__path__ = [f"{tree}/layers"]
        sys.modules["layers"] = layers
        import layers.discriminator  # noqa: F401
        import layers.discriminator2  # noqa: F401
        import layers.gcn  # noqa: F401
        import layers.readout  # noqa: F401
        layers.GCN = layers.gcn.GCN
        layers.AvgReadout = layers.readout.AvgReadout
        layers.Discriminator = layers.discriminator.Discriminator
        layers.Discriminator2 = layers.discriminator2.Discriminator2

        models = types.ModuleType("models")
        models.__path__ = [f"{tree}/models"]
        sys.modules["models"] = models
        import models.LP  # noqa: F401
        import models.dgi  # noqa: F401
        import models.graphcl  # noqa: F401
        import models.logreg  # noqa: F401
        models.DGI = models.dgi.DGI
        models.GraphCL = models.graphcl.GraphCL
        models.Lp = models.LP.Lp
        models.LogReg = models.logreg.LogReg
        import models.gcnlayers  # noqa: F401
        models.GcnLayers = models.gcnlayers.GcnLayers

        import preprompt  # noqa: F401
        setattr(ns, f"{prefix}_preprompt", preprompt)
    finally:
        sys.path[:] = saved_path
        _purge(["layers", "models", "preprompt", "utils"])


def load_reference() -> SimpleNamespace:
    """Load (once) and return every reference symbol the parity tests use."""
    if "ref" not in _CACHE:
        _patch_cuda()
        ns = SimpleNamespace()
        _load_node(ns)
        _load_edge(ns)
        _CACHE["ref"] = ns
    return _CACHE["ref"]


def load_graph_driver() -> SimpleNamespace:
    """``load_reference()`` plus the RAGraph_graph driver stack."""
    ns = load_reference()
    if not hasattr(ns, "graph_preprompt"):
        _load_tree_driver(ns, "graph", f"{REF}/RAGraph_graph")
    return ns


def load_fewshot_driver() -> SimpleNamespace:
    """``load_reference()`` plus the fewshot trees' driver stacks
    (``fewshot_*`` = RAGraph_node_fewshot, ``gfewshot_*`` =
    RAGraph_graph_fewshot)."""
    ns = load_reference()
    if not hasattr(ns, "fewshot_preprompt"):
        _load_tree_driver(ns, "fewshot", f"{REF}/RAGraph_node_fewshot")
    if not hasattr(ns, "gfewshot_preprompt"):
        _load_tree_driver(ns, "gfewshot", f"{REF}/RAGraph_graph_fewshot")
    return ns
