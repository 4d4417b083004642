"""Graph-level head-to-head e2e differential vs the reference's own drivers.

Extends the static-node arm (reference_e2e_differential.py) to the
RAGraph_graph pipeline: the reference's ``RAGraph_graph/pretrain.py`` +
``finetune-rag.py`` protocols run end-to-end on torch-CPU (via
tests/_reference_loader.load_graph_driver) next to
``cli.node --level graph`` on the SAME synthetic TU data, and the final
5-seed mean test accuracies are compared on the SE-of-the-mean-difference
criterion.

Reference quirks reproduced faithfully on the reference side (their own
code executes; this file only mirrors the driver-script glue):

- pretrain (``RAGraph_graph/pretrain.py``): seed 39, batch 8 drop_last,
  lr 1e-4, ``nb_epochs = 10`` (the value shipped in the snapshot, :50),
  per-epoch ``np.random.seed + torch.manual_seed`` reseed (:75-78, note:
  NOT ``random.seed``), ``prompt_pretrain_sample(adj, 50)`` (:85),
  optimizer re-created per step (:148), loss summed over batches with ONE
  backward per epoch (:185-201), save-on-best BEFORE the backward, and the
  double-+I quirk: the dense adjacencies fed to the model are
  ``normalize_adj(A + I) + I`` (:110-130, the ``sparse=False`` branch
  re-adds the identity on top of the normalized matrix).
- finetune (``RAGraph_graph/finetune-rag.py``): 5 seeded reruns, shuffle,
  0.5/0.3/0.2 split, batch_size **1** (:27), downstream lr 1e-3 for 50
  epochs with best-loss checkpointing (patience 100 never fires), library
  appended from val before test (:113), per-graph argmax accuracy.
- the graph RAGraph constructor loads fewshot test-set tensors that its
  forward never uses (``RAGraph.py:43`` FewShotBase — vestigial); stub
  ``.pt`` files are generated in a temp cwd so the constructor runs.

Ours: ``cli.node pretrain`` (hidden 64, batch 8, lr 1e-4, 10 epochs,
``--lp-samples 50``) + ``cli.node finetune --level graph`` (batch 1,
lr 1e-3, 50 epochs, 5 seeds) on the same generator.

Run: ``python experiments/reference_e2e_differential_graph.py``
Writes results/reference_e2e_differential_graph.json.
"""

from __future__ import annotations

import copy
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp
import torch

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reference_e2e_differential import (FakeLoader, _force_cpu,  # noqa: E402
                                        to_fake_dataset)

HID = 64
PRE_BATCH = 8             # RAGraph_graph/pretrain.py:49
PRE_EPOCHS = 10           # pretrain.py:50 (shipped value)
PRE_LR = 1e-4             # pretrain.py:52
PRE_SEED = 39             # pretrain.py:17
PRE_PATIENCE = 100        # pretrain.py:51
LP_SAMPLES = 50           # pretrain.py:85
DOWN_EPOCHS = 50          # finetune-rag.py:37
DOWN_LR = 1e-3            # finetune-rag.py:36
TEST_TIMES = 5            # finetune-rag.py:49
NB_CLASSES = 3
FEAT_DIM = 16


def _write_fewshot_stubs(workdir, name, feat_dim, num_classes):
    """The graph RAGraph constructor torch.loads fewshot test-set files
    its forward never uses (RAGraph_graph/ragraph_utils/FewShotBase.py:9-13
    — vestigial); give it consistent tiny tensors."""
    d = os.path.join(workdir, "data", f"fewshot_{name}_graph", "testset")
    os.makedirs(d, exist_ok=True)
    m = 2 * num_classes
    g = torch.Generator().manual_seed(0)
    torch.save(torch.eye(m), os.path.join(d, "adj.pt"))
    torch.save(torch.randn(m, feat_dim, generator=g),
               os.path.join(d, "feature.pt"))
    torch.save(torch.arange(m) % num_classes, os.path.join(d, "labels.pt"))
    torch.save(torch.full((num_classes,), 2), os.path.join(d, "graph_len.pt"))


def reference_graph_pretrain(ref, dataset):
    """``RAGraph_graph/pretrain.py:60-206`` at matched tiny config."""
    import random

    process = ref.graph_process
    aug = ref.graph_aug
    PrePrompt = ref.graph_preprompt.PrePrompt
    prompt_pretrain_sample = ref.graph_preprompt.prompt_pretrain_sample

    # pretrain.py:37-43 module-level seeding
    random.seed(PRE_SEED)
    np.random.seed(PRE_SEED)
    torch.manual_seed(PRE_SEED)

    loader = FakeLoader(dataset, batch_size=PRE_BATCH, shuffle=True,
                        drop_last=True)
    model = PrePrompt(dataset.num_node_attributes, HID, "prelu", 1, 0.3)
    best, best_state, cnt_wait = 1e9, None, 0
    for _epoch in range(PRE_EPOCHS):
        # pretrain.py:75-78 — np+torch only, every epoch
        np.random.seed(PRE_SEED)
        torch.manual_seed(PRE_SEED)
        loss = 0
        step = 0
        for step, data in enumerate(loader):
            features, adj = process.process_tu(data, NB_CLASSES,
                                               dataset.num_node_attributes)
            negative_sample = prompt_pretrain_sample(adj, LP_SAMPLES)
            nb_nodes = features.shape[0]
            features = torch.FloatTensor(np.asarray(features)[np.newaxis])
            aug_adj1 = aug.aug_random_edge(adj, drop_percent=0.1)
            aug_adj2 = aug.aug_random_edge(adj, drop_percent=0.1)
            adj_n = process.normalize_adj(adj + sp.eye(adj.shape[0]))
            aug_adj1 = process.normalize_adj(
                aug_adj1 + sp.eye(aug_adj1.shape[0]))
            aug_adj2 = process.normalize_adj(
                aug_adj2 + sp.eye(aug_adj2.shape[0]))
            # pretrain.py:126-130 sparse=False: the identity is added
            # AGAIN on top of the normalized adjacency (reference quirk)
            adj_t = torch.FloatTensor(np.asarray(
                (adj_n + sp.eye(adj_n.shape[0])).todense())[np.newaxis])
            aug1_t = torch.FloatTensor(np.asarray(
                (aug_adj1 + sp.eye(aug_adj1.shape[0])).todense())[np.newaxis])
            aug2_t = torch.FloatTensor(np.asarray(
                (aug_adj2 + sp.eye(aug_adj2.shape[0])).todense())[np.newaxis])
            optimiser = torch.optim.Adam(model.parameters(), lr=PRE_LR,
                                         weight_decay=0.0)
            model.train()
            optimiser.zero_grad()
            idx = np.random.permutation(nb_nodes)
            shuf_fts = features[:, idx, :]
            lbl = torch.cat((torch.ones(1, nb_nodes),
                             torch.zeros(1, nb_nodes)), 1)
            logit = model(features, shuf_fts, features, features, adj_t,
                          aug1_t, aug2_t, False, None, None, None,
                          lbl=lbl, sample=negative_sample)
            loss = loss + logit
        loss = loss / (step + 1)
        if float(loss) < best:
            best, cnt_wait = float(loss), 0
            best_state = copy.deepcopy(model.state_dict())
        else:
            cnt_wait += 1
        if cnt_wait == PRE_PATIENCE:
            break
        loss.backward()
        optimiser.step()
    model.load_state_dict(best_state)   # pretrain.py:206
    model.eval()
    return model, best


def reference_graph_finetune(ref, dataset, pretrain_model):
    """``RAGraph_graph/finetune-rag.py:51-135``."""
    seed_everything = ref.graph_utility.seed_everything
    process_tu_dataset = ref.graph_utility.process_tu_dataset
    RAGraph = ref.graph_RAGraph

    tgb_cls = RAGraph.__init__.__globals__["ToyGraphBase"]
    tgb_cls.build_toy_graph.__globals__["DataLoader"] = FakeLoader

    accuracy_list = []
    for i in range(TEST_TIMES):
        seed_everything(i)
        dataset = dataset.shuffle()
        train_ds = dataset[:int(0.5 * len(dataset))]
        val_ds = dataset[int(0.5 * len(dataset)):int(0.8 * len(dataset))]
        test_ds = dataset[int(0.8 * len(dataset)):]

        rag = RAGraph(pretrain_model, resource_dataset=train_ds,
                      feture_size=dataset.num_node_attributes,
                      num_class=NB_CLASSES, emb_size=HID,
                      finetune=True, noise_finetune=False)

        rag.train()
        best_loss, best_state = float("inf"), None
        val_loader = FakeLoader(val_ds, batch_size=1, shuffle=True)
        opt = torch.optim.Adam(rag.parameters(), lr=DOWN_LR)
        for _epoch in range(DOWN_EPOCHS):
            total_loss = 0.0
            for data in val_loader:
                features, adj = process_tu_dataset(
                    data, NB_CLASSES, dataset.num_node_attributes)
                opt.zero_grad()
                logits = rag(features, adj)
                graph_label = torch.nn.functional.one_hot(
                    data.y, num_classes=NB_CLASSES).float()
                loss = torch.nn.functional.cross_entropy(logits, graph_label)
                total_loss += loss.item()
                loss.backward()
                opt.step()
            epoch_loss = total_loss / len(val_loader)
            if epoch_loss < best_loss:
                best_loss = epoch_loss
                best_state = copy.deepcopy(rag.state_dict())

        rag.load_state_dict(best_state)
        rag.eval()
        rag.toy_graph_base.build_toy_graph(val_ds)   # append, no reset

        correct = total = 0
        test_loader = FakeLoader(test_ds, batch_size=1, shuffle=True)
        with torch.no_grad():
            for data in test_loader:
                features, adj = process_tu_dataset(
                    data, NB_CLASSES, dataset.num_node_attributes)
                logits = rag(features, adj)
                predict_label = torch.argmax(logits).unsqueeze(0)
                correct += int(torch.sum(predict_label == data.y))
                total += len(predict_label)
        acc = 100.0 * correct / total
        print(f"[reference] run {i + 1}/{TEST_TIMES}: accuracy {acc:.4f}")
        accuracy_list.append(acc)
    accs = np.array(accuracy_list)
    return float(accs.mean()), float(accs.std()), accuracy_list


def run_graph():
    _force_cpu()
    from _reference_loader import load_graph_driver

    from ragraph_tpu.data import synthetic_tu_dataset

    ds = synthetic_tu_dataset(seed=0, num_graphs=120,
                              num_classes=NB_CLASSES, feat_dim=FEAT_DIM)
    fake = to_fake_dataset(ds)
    ref = load_graph_driver()

    t0 = time.time()
    pre_model, pre_best = reference_graph_pretrain(ref, fake)
    t_pre = time.time() - t0
    print(f"[reference] pretrain best loss {pre_best:.4f} ({t_pre:.0f}s)")

    # the vestigial FewShotBase torch.loads live under the cwd
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        _write_fewshot_stubs(tmp, fake.name, FEAT_DIM, NB_CLASSES)
        cwd = os.getcwd()
        os.chdir(tmp)
        try:
            t0 = time.time()
            ref_mean, ref_std, ref_accs = reference_graph_finetune(
                ref, fake, pre_model)
            t_ft = time.time() - t0
        finally:
            os.chdir(cwd)
    print(f"[reference] mean {ref_mean:.4f} std {ref_std:.4f} ({t_ft:.0f}s)")

    # ---- our side: the CLI drivers with matched knobs on the same data
    from ragraph_tpu.cli import node as node_cli

    os.makedirs("results", exist_ok=True)
    t0 = time.time()
    node_cli.main(["pretrain", "--dataset", "SYNTH",
                   "--hidden", str(HID), "--batch-size", str(PRE_BATCH),
                   "--pretrain-epochs", str(PRE_EPOCHS),
                   "--lr", str(PRE_LR), "--lp-samples", str(LP_SAMPLES),
                   "--seed", str(PRE_SEED)])
    ours_mean = node_cli.main([
        "finetune", "--dataset", "SYNTH", "--level", "graph",
        "--hidden", str(HID), "--batch-size", "1",
        "--epochs", str(DOWN_EPOCHS), "--lr", str(DOWN_LR),
        "--test-times", str(TEST_TIMES), "--library-capacity", "16384"])
    t_ours = time.time() - t0
    with open("results/finetune_graph_SYNTH.json") as f:
        ours = json.load(f)
    print(f"[ours] mean {ours['mean']:.4f} std {ours['std']:.4f} "
          f"({t_ours:.0f}s)")

    gap = ours_mean - ref_mean
    _n = min(len(ref_accs), len(ours["accuracy"]))
    se = float(np.sqrt(np.var(ref_accs, ddof=1) / _n
                       + np.var(ours["accuracy"], ddof=1) / _n))
    out = {
        "config": {"hidden": HID, "pretrain_batch": PRE_BATCH,
                   "pretrain_epochs": PRE_EPOCHS, "pretrain_lr": PRE_LR,
                   "lp_samples": LP_SAMPLES,
                   "downstream_epochs": DOWN_EPOCHS,
                   "downstream_lr": DOWN_LR, "finetune_batch": 1,
                   "test_times": TEST_TIMES,
                   "data": "synthetic_tu_dataset(seed=0, 120 graphs, "
                           "3 classes, feat 16) — graph level"},
        "reference": {"mean": ref_mean, "std": ref_std,
                      "accuracy": ref_accs,
                      "pretrain_best_loss": pre_best,
                      "protocol": "RAGraph_graph/pretrain.py + "
                                  "finetune-rag.py (torch-CPU, fake-PyG "
                                  "scaffolding)"},
        "ours": {"mean": ours["mean"], "std": ours["std"],
                 "accuracy": ours["accuracy"],
                 "protocol": "cli.node pretrain + finetune --level graph"},
        "gap_pp": gap,
        "gap_se_pp": se,
        "gap_sigma": gap / max(se, 1e-12),
        "within_seed_noise": bool(abs(gap) <= 2.0 * se),
    }
    with open("results/reference_e2e_differential_graph.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("gap_pp", "gap_se_pp", "gap_sigma",
                       "within_seed_noise")}))
    return out


if __name__ == "__main__":
    run_graph()
