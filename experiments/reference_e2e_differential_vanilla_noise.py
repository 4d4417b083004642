"""Training-free (vanilla) and noise-finetune head-to-head differentials.

Completes the driver-family coverage of the head-to-head protocol: after
finetune-rag (static/graph/fewshot×2/edge), this runs the remaining two
runnable driver families of the reference — ``vanilla-rag.py``
(training-free retrieval fusion) and ``finetune-noise.py`` (finetune-rag
with ``noise_finetune=True``; the file differs from finetune-rag.py only
in that flag and output names) — on torch-CPU next to ``cli.node
vanilla`` / ``cli.node finetune --noise`` on the same synthetic TU data.

Reference protocols mirrored faithfully:

- vanilla node (``RAGraph_node/vanilla-rag.py:44-80``): per seed i,
  seed_everything(i) + shuffle, resource library from the FIRST 0.8 of
  the dataset (train+val in one build), test on the last 0.2, batch 256,
  ``RAGraph(..., finetune=False)``, argmax accuracy. Our CLI builds the
  library from train (0.5) and appends val (0.3) — the same union.
- vanilla graph (``RAGraph_graph/vanilla-rag.py:50-80``): same with
  batch 1 and the graph RAGraph (whose constructor loads vestigial
  FewShotBase tensors — stubbed in a temp cwd, as in the graph
  finetune differential).
- noise node (``RAGraph_node/finetune-noise.py``): identical to
  finetune-rag.py except ``noise_finetune=True`` (diff: lines 59/71/127
  — flag and file names only); gaussian noise is injected into retrieved
  values during training retrievals (``ToyGraphBase.retrieve``).

Both vanilla arms share the reference pretrain with their static
counterparts (the drivers load the same ``model_{ds}.pkl``).

Run: ``python experiments/reference_e2e_differential_vanilla_noise.py
[vanilla-node|vanilla-graph|noise-node|all]``
Writes results/reference_e2e_differential_{vanilla_node,vanilla_graph,
noise_node}.json.
"""

from __future__ import annotations

import copy
import json
import os
import sys
import tempfile
import time

import numpy as np
import torch

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reference_e2e_differential import (BATCH, DOWN_EPOCHS,  # noqa: E402
                                        HID, NB_CLASSES, FEAT_DIM,
                                        TEST_TIMES, FakeLoader, _force_cpu,
                                        reference_pretrain,
                                        to_fake_dataset)
from reference_e2e_differential_graph import (  # noqa: E402
    _write_fewshot_stubs, reference_graph_pretrain)

VAN_BATCH_NODE = 256    # vanilla-rag.py:27
VAN_BATCH_GRAPH = 1     # RAGraph_graph/vanilla-rag.py:26
DOWN_LR = 1e-3          # finetune-noise.py downstream lr (same as rag)


def _vanilla_protocol(ref, dataset, pre_model, *, level):
    """``vanilla-rag.py`` loop: training-free RAGraph over 5 seeds."""
    if level == "node":
        seed_everything = ref.node_utility.seed_everything
        process_tu_dataset = ref.node_utility.process_tu_dataset
        RAGraph = ref.node_RAGraph
        batch = VAN_BATCH_NODE
    else:
        seed_everything = ref.graph_utility.seed_everything
        process_tu_dataset = ref.graph_utility.process_tu_dataset
        RAGraph = ref.graph_RAGraph
        batch = VAN_BATCH_GRAPH

    tgb_cls = RAGraph.__init__.__globals__["ToyGraphBase"]
    tgb_cls.build_toy_graph.__globals__["DataLoader"] = FakeLoader

    accs = []
    for i in range(TEST_TIMES):
        seed_everything(i)
        dataset = dataset.shuffle()
        train_val = dataset[:int(0.8 * len(dataset))]
        test_ds = dataset[int(0.8 * len(dataset)):]

        rag = RAGraph(pre_model, resource_dataset=train_val,
                      feture_size=dataset.num_node_attributes,
                      num_class=NB_CLASSES, emb_size=HID,
                      finetune=False)
        rag.eval()

        correct = total = 0
        test_loader = FakeLoader(test_ds, batch_size=batch, shuffle=True)
        with torch.no_grad():
            for data in test_loader:
                if level == "node":
                    features, adj, node_labels = process_tu_dataset(
                        data, dataset.num_node_attributes)
                    logits = rag(features, adj)
                    pred = torch.argmax(logits, dim=1)
                    gold = torch.argmax(node_labels, dim=1)
                else:
                    features, adj = process_tu_dataset(
                        data, NB_CLASSES, dataset.num_node_attributes)
                    logits = rag(features, adj)
                    pred = torch.argmax(logits).unsqueeze(0)
                    gold = data.y
                correct += int(torch.sum(pred == gold))
                total += len(gold)
        acc = 100.0 * correct / total
        print(f"[reference] run {i + 1}/{TEST_TIMES}: accuracy {acc:.4f}")
        accs.append(acc)
    arr = np.array(accs)
    return float(arr.mean()), float(arr.std()), accs


def reference_noise_finetune(ref, dataset, pre_model):
    """``RAGraph_node/finetune-noise.py`` = finetune-rag.py:46-124 with
    ``noise_finetune=True`` (:59)."""
    seed_everything = ref.node_utility.seed_everything
    process_tu_dataset = ref.node_utility.process_tu_dataset
    RAGraph = ref.node_RAGraph
    tgb_cls = RAGraph.__init__.__globals__["ToyGraphBase"]
    tgb_cls.build_toy_graph.__globals__["DataLoader"] = FakeLoader

    accs = []
    for i in range(TEST_TIMES):
        seed_everything(i)
        dataset = dataset.shuffle()
        train_ds = dataset[:int(0.5 * len(dataset))]
        val_ds = dataset[int(0.5 * len(dataset)):int(0.8 * len(dataset))]
        test_ds = dataset[int(0.8 * len(dataset)):]

        rag = RAGraph(pre_model, resource_dataset=train_ds,
                      feture_size=dataset.num_node_attributes,
                      num_class=NB_CLASSES, emb_size=HID,
                      finetune=True, noise_finetune=True)

        rag.train()
        best_loss, best_state = float("inf"), None
        val_loader = FakeLoader(val_ds, batch_size=BATCH, shuffle=True)
        opt = torch.optim.Adam(rag.parameters(), lr=DOWN_LR)
        for _epoch in range(DOWN_EPOCHS):
            total_loss = 0.0
            for data in val_loader:
                features, adj, node_labels = process_tu_dataset(
                    data, dataset.num_node_attributes)
                opt.zero_grad()
                logits = rag(features, adj)
                loss = torch.nn.functional.cross_entropy(logits,
                                                         node_labels)
                total_loss += loss.item()
                loss.backward()
                opt.step()
            epoch_loss = total_loss / len(val_loader)
            if epoch_loss < best_loss:
                best_loss = epoch_loss
                best_state = copy.deepcopy(rag.state_dict())

        rag.load_state_dict(best_state)
        rag.eval()
        rag.toy_graph_base.build_toy_graph(val_ds)

        correct = total = 0
        test_loader = FakeLoader(test_ds, batch_size=BATCH, shuffle=True)
        with torch.no_grad():
            for data in test_loader:
                features, adj, node_labels = process_tu_dataset(
                    data, dataset.num_node_attributes)
                logits = rag(features, adj)
                pred = torch.argmax(logits, dim=1)
                gold = torch.argmax(node_labels, dim=1)
                correct += int(torch.sum(pred == gold))
                total += len(gold)
        acc = 100.0 * correct / total
        print(f"[reference] run {i + 1}/{TEST_TIMES}: accuracy {acc:.4f}")
        accs.append(acc)
    arr = np.array(accs)
    return float(arr.mean()), float(arr.std()), accs


def _emit(name, ref_tuple, ours, extra_cfg, ours_protocol):
    ref_mean, ref_std, ref_accs = ref_tuple
    gap = ours["mean"] - ref_mean
    n = min(len(ref_accs), len(ours["accuracy"]))
    se = float(np.sqrt(np.var(ref_accs, ddof=1) / n
                       + np.var(ours["accuracy"], ddof=1) / n))
    out = {
        "config": {"hidden": HID, "test_times": TEST_TIMES,
                   "data": "synthetic_tu_dataset(seed=0, 120 graphs, "
                           "3 classes, feat 16)", **extra_cfg},
        "reference": {"mean": ref_mean, "std": ref_std,
                      "accuracy": ref_accs},
        "ours": {"mean": ours["mean"], "std": ours["std"],
                 "accuracy": ours["accuracy"], "protocol": ours_protocol},
        "gap_pp": gap,
        "gap_se_pp": se,
        "gap_sigma": gap / max(se, 1e-12),
        "within_seed_noise": bool(abs(gap) <= 2.0 * se),
    }
    with open(f"results/reference_e2e_differential_{name}.json", "w") as f:
        json.dump(out, f, indent=2)
    print(name, json.dumps({k: out[k] for k in
                            ("gap_pp", "gap_se_pp", "gap_sigma",
                             "within_seed_noise")}))
    return out


def _ours_pretrain_node(node_cli):
    """Same knobs as the static differential's our-side pretrain."""
    node_cli.main(["pretrain", "--dataset", "SYNTH",
                   "--hidden", str(HID), "--batch-size", str(BATCH),
                   "--pretrain-epochs", "50", "--seed", "42"])


def run(mode="all"):
    _force_cpu()
    from _reference_loader import load_graph_driver

    from ragraph_tpu.cli import node as node_cli
    from ragraph_tpu.data import synthetic_tu_dataset

    ds = synthetic_tu_dataset(seed=0, num_graphs=120,
                              num_classes=NB_CLASSES, feat_dim=FEAT_DIM)
    fake = to_fake_dataset(ds)
    ref = load_graph_driver()
    os.makedirs("results", exist_ok=True)

    pre_node = None
    if mode in ("vanilla-node", "noise-node", "all"):
        t0 = time.time()
        pre_node, best = reference_pretrain(ref, fake)
        print(f"[reference] node pretrain best {best:.4f} "
              f"({time.time() - t0:.0f}s)")
        _ours_pretrain_node(node_cli)

    if mode in ("vanilla-node", "all"):
        ref_tuple = _vanilla_protocol(ref, fake, pre_node, level="node")
        node_cli.main(["vanilla", "--dataset", "SYNTH",
                       "--hidden", str(HID), "--batch-size", str(BATCH),
                       "--test-times", str(TEST_TIMES),
                       "--library-capacity", "16384"])
        with open("results/vanilla_node_SYNTH.json") as f:
            ours = json.load(f)
        _emit("vanilla_node", ref_tuple, ours,
              {"reference_batch": VAN_BATCH_NODE, "finetune": False},
              "cli.node vanilla")

    if mode in ("noise-node", "all"):
        ref_tuple = reference_noise_finetune(ref, fake, pre_node)
        node_cli.main(["finetune", "--noise", "--dataset", "SYNTH",
                       "--hidden", str(HID), "--batch-size", str(BATCH),
                       "--epochs", str(DOWN_EPOCHS),
                       "--test-times", str(TEST_TIMES),
                       "--library-capacity", "16384"])
        with open("results/noise_node_SYNTH.json") as f:
            ours = json.load(f)
        _emit("noise_node", ref_tuple, ours,
              {"downstream_epochs": DOWN_EPOCHS, "noise_finetune": True},
              "cli.node finetune --noise")

    if mode in ("vanilla-graph", "all"):
        t0 = time.time()
        pre_graph, best = reference_graph_pretrain(ref, fake)
        print(f"[reference] graph pretrain best {best:.4f} "
              f"({time.time() - t0:.0f}s)")
        cwd = os.getcwd()
        with tempfile.TemporaryDirectory() as tmp:
            _write_fewshot_stubs(tmp, fake.name, FEAT_DIM, NB_CLASSES)
            os.chdir(tmp)
            try:
                ref_tuple = _vanilla_protocol(ref, fake, pre_graph,
                                              level="graph")
            finally:
                os.chdir(cwd)
        # our graph pretrain with the graph driver's knobs (lr 1e-4,
        # 10 epochs, lp 50 — reference_e2e_differential_graph.py)
        node_cli.main(["pretrain", "--dataset", "SYNTH",
                       "--hidden", str(HID), "--batch-size", "8",
                       "--pretrain-epochs", "10", "--lr", "1e-4",
                       "--lp-samples", "50", "--seed", "39"])
        node_cli.main(["vanilla", "--dataset", "SYNTH", "--level", "graph",
                       "--hidden", str(HID), "--batch-size", "1",
                       "--test-times", str(TEST_TIMES),
                       "--library-capacity", "16384"])
        with open("results/vanilla_graph_SYNTH.json") as f:
            ours = json.load(f)
        _emit("vanilla_graph", ref_tuple, ours,
              {"reference_batch": VAN_BATCH_GRAPH, "finetune": False},
              "cli.node vanilla --level graph")


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "all")
