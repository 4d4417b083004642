"""Fewshot head-to-head e2e differentials vs the reference's own drivers.

Completes the head-to-head protocol for all five SURVEY §1 pipelines:
the RAGraph_node_fewshot and RAGraph_graph_fewshot trees' pretrain.py +
finetune-rag.py drivers run end-to-end on torch-CPU (via
tests/_reference_loader.load_fewshot_driver) next to ``cli.fewshot``
on the SAME synthetic TU data and the SAME exported k-shot support
sets; the final 5-task mean test accuracies are compared on the
SE-of-the-mean-difference criterion.

Shared-data notes (both arms):

- The per-task k-shot support tensors the reference drivers load
  (``RAGraph_node_fewshot/finetune-rag.py:62-64``,
  ``RAGraph_graph_fewshot/finetune-rag.py:51-55``) are STRIPPED from the
  snapshot and no shipped script writes them (``dataset.py``'s
  ``get_k_shot_nodes`` sampler is dead code — the live lines export full
  splits). Both sides here consume the same
  ``ragraph_tpu.data.fewshot_export`` artifacts: per-task node supports
  and one shared graph support (the graph driver loads a single
  ``testset/`` for every task).
- Both fewshot RAGraph constructors hardwire fusion weights by dataset
  NAME and raise on unknown names (``RAGraph_node_fewshot/
  RAGraph.py:24-33``); the fake dataset masquerades as "ENZYMES" on the
  reference side, and our CLI gets the matching explicit
  ``--retrieve-weight/--label-weight``.
- ``RAGraph_graph_fewshot/ragraph_utils/__init__.py`` imports
  ``fewshot_utility.py``, a file ABSENT from the snapshot (the package
  is unimportable as shipped); the node-fewshot tree's identically-named
  helpers (``utility.py:115-162``) stand in for the graph driver glue.

Reference quirks reproduced faithfully (their own classes execute; this
file only mirrors driver-script glue):

- node pretrain (``RAGraph_node_fewshot/pretrain.py``): twin of the
  static tree's except ``PrePrompt(..., 2, 0.3)`` — seed_everything(39)
  at the top of EVERY epoch (:67), batch 16 under the ENZYMES masquerade
  (:42), lr 1e-3, sparse=False (:51), optimizer re-created per step,
  loss summed over batches divided by ``step`` (not step+1, :157), ONE
  backward per epoch, save-on-best before the backward, patience 10.
- graph pretrain (``RAGraph_graph_fewshot/pretrain.py``): twin of the
  graph tree's with 2 layers — batch 8, nb_epochs 10 (shipped value),
  lr 1e-4, per-epoch np+torch reseed only, prompt_pretrain_sample(adj,
  50), the double-+I dense-adjacency quirk of the sparse=False branch.
- node finetune (``finetune-rag.py:52-149``): per task i
  seed_everything(i) + shuffle + 0.5/0.3/0.2 split, support prototypes
  RECOMPUTED inside every train step, ``pretrain_model.gcn.convs[0]
  .eval()``, Adam(lr 1e-4, wd 1e-4) batch 16 for 50 epochs with
  best-loss checkpoint + patience 10, library appended from val before
  test, cosine-to-prototype argmax accuracy.
- graph finetune (``RAGraph_graph_fewshot/finetune-rag.py:79-190``):
  ONE support set shared by all tasks, per-graph mean-pooled support
  logits via the graph_len cursor loop (:62-76), batch 1, Adam(lr 1e-4,
  NO weight decay), patience 10; the RAGraph constructor's FewShotBase
  torch.loads ``data/fewshot_{name}_graph/testset/*.pt`` — the REAL
  shared support is written there (temp cwd), matching what the driver
  itself loads.

Ours: ``cli.node pretrain --encoder-layers 2`` + ``cli.fewshot finetune
--support-dir ... --patience 10`` with matched knobs on the same
generator (SYNTH-HARD: signal 0.6 — plain SYNTH saturates ~98% on both
sides, which would make the comparison vacuous).

Run: ``python experiments/reference_e2e_differential_fewshot.py [node|graph|all]``
Writes results/reference_e2e_differential_fewshot_{node,graph}.json.
"""

from __future__ import annotations

import copy
import json
import os
import sys
import tempfile
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
SHOTS = 5                  # both finetune-rag.py shotnum=5
TEST_TIMES = 5
NB_CLASSES = 3
FEAT_DIM = 16

# node arm (RAGraph_node_fewshot)
N_PRE_BATCH = 16           # pretrain.py:42 (ENZYMES masquerade)
N_PRE_EPOCHS_CAP = 100     # nb_epochs=1000; patience stops first
N_PRE_PATIENCE = 10        # pretrain.py:46
N_PRE_LR = 1e-3            # pretrain.py:47
N_BATCH = 16               # finetune-rag.py:30
N_DOWN_LR = 1e-4           # finetune-rag.py:35
N_DOWN_WD = 1e-4           # finetune-rag.py:36
N_DOWN_EPOCHS = 50         # finetune-rag.py:37
N_DOWN_PATIENCE = 10       # finetune-rag.py:38
N_RW, N_LW = 0.5, 0.5      # RAGraph.py:25-27 (ENZYMES)

# graph arm (RAGraph_graph_fewshot)
G_PRE_BATCH = 8            # pretrain.py:46
G_PRE_EPOCHS = 10          # pretrain.py:47 (shipped value)
G_PRE_PATIENCE = 100       # pretrain.py:48
G_PRE_LR = 1e-4            # pretrain.py:49
G_LP_SAMPLES = 50          # pretrain.py:85
G_BATCH = 1                # finetune-rag.py:29
G_DOWN_LR = 1e-4           # finetune-rag.py:37
G_DOWN_EPOCHS = 50         # finetune-rag.py:38
G_DOWN_PATIENCE = 10       # finetune-rag.py:39
G_RW, G_LW = 0.3, 0.8      # RAGraph.py:17-19 (ENZYMES)

PRE_SEED = 39


def synth_hard():
    from ragraph_tpu.data import synthetic_tu_dataset
    return synthetic_tu_dataset(seed=0, num_graphs=120,
                                num_classes=NB_CLASSES, feat_dim=FEAT_DIM,
                                signal=0.6, p_in=0.35, p_out=0.15,
                                name="SYNTH-HARD")


# ---------------------------------------------------------------------------
# snapshot repairs: BOTH fewshot trees' pretrain paths are unrunnable as
# shipped — their GcnLayers.forward LP branch starts with a debugging
# `assert False` tripwire (RAGraph_node_fewshot/models/gcnlayers.py:50,
# RAGraph_graph_fewshot/models/gcnlayers.py:47) in front of the very
# lines that are LIVE in the static trees (RAGraph_node/models/
# gcnlayers.py:52-56: bns[i] + dropout), and the node tree additionally
# has an arity bug: preprompt.py:55 calls self.lp(gcn, seq, adj, sparse)
# but its own Lp.forward(gcn, seq, adj) takes three (models/LP.py:14).
# The patches below re-state the reference's own lines minus the
# tripwire / with the extra arg swallowed — nothing else changes.
# ---------------------------------------------------------------------------
def _neutralize_fewshot_asserts(ref):
    def node_gcn_forward(self, seq, adj, LP=False):
        # gcnlayers.py:43-59 minus the `assert False` (:50)
        graph_output = torch.squeeze(seq, dim=0)
        for i in range(self.num_layers_num):
            graph_output = self.convs[i]((graph_output, adj))
            if LP:
                graph_output = self.bns[i](graph_output)
                graph_output = self.dropout(graph_output)
            if i == 0:
                self.resource_key = graph_output
            else:
                self.resource_value = graph_output
        return graph_output.unsqueeze(dim=0)

    def node_lp_forward(self, gcn, seq, adj, sparse=False):
        # models/LP.py:14-17 accepting the 4th arg preprompt.py:55 passes
        h_1 = gcn(seq, adj, True)
        return self.sigm(h_1.squeeze(dim=0))

    def graph_gcn_forward(self, seq, adj, sparse, LP=False):
        # RAGraph_graph_fewshot/models/gcnlayers.py:40-51 minus :47
        graph_output = torch.squeeze(seq, dim=0)
        for i in range(self.num_layers_num):
            graph_output = self.convs[i]((graph_output, adj))
            if LP:
                graph_output = self.bns[i](graph_output)
                graph_output = self.dropout(graph_output)
        return graph_output.unsqueeze(dim=0)

    n_pp = ref.fewshot_preprompt
    n_pp.GcnLayers.forward = node_gcn_forward
    n_pp.Lp.forward = node_lp_forward
    g_pp = ref.gfewshot_preprompt
    g_pp.GcnLayers.forward = graph_gcn_forward


# ---------------------------------------------------------------------------
# reference pretrains (twins of the static/graph arms, 2-layer PrePrompt)
# ---------------------------------------------------------------------------
def reference_node_fewshot_pretrain(ref, dataset):
    """``RAGraph_node_fewshot/pretrain.py`` at matched tiny config."""
    seed_everything = ref.fewshot_utility.seed_everything
    process = ref.fewshot_process
    aug = ref.fewshot_aug
    PrePrompt = ref.fewshot_preprompt.PrePrompt
    prompt_pretrain_sample = ref.fewshot_preprompt.prompt_pretrain_sample

    seed_everything(PRE_SEED)
    loader = FakeLoader(dataset, batch_size=N_PRE_BATCH, shuffle=True,
                        drop_last=True)
    model = PrePrompt(dataset.num_node_attributes, HID, "prelu", 2, 0.3)
    best, best_state, cnt_wait = 1e9, None, 0
    for _epoch in range(N_PRE_EPOCHS_CAP):
        seed_everything(PRE_SEED)   # :67 — every epoch
        loss = 0
        step = 0
        for step, data in enumerate(loader):
            features, adj, _ = process.process_tu(
                data, dataset.num_node_attributes)
            negative_sample = prompt_pretrain_sample(adj, 100)
            nb_nodes = features.shape[0]
            features = torch.FloatTensor(np.asarray(features)[np.newaxis])
            aug_adj1 = aug.aug_random_edge(adj, drop_percent=0.1)
            aug_adj2 = aug.aug_random_edge(adj, drop_percent=0.1)
            adj_n = process.normalize_adj(adj + sp.eye(adj.shape[0]))
            aug_adj1 = process.normalize_adj(
                aug_adj1 + sp.eye(aug_adj1.shape[0]))
            aug_adj2 = process.normalize_adj(
                aug_adj2 + sp.eye(aug_adj2.shape[0]))
            adj_t = torch.FloatTensor(np.asarray(adj_n.todense())[np.newaxis])
            aug1_t = torch.FloatTensor(
                np.asarray(aug_adj1.todense())[np.newaxis])
            aug2_t = torch.FloatTensor(
                np.asarray(aug_adj2.todense())[np.newaxis])
            optimiser = torch.optim.Adam(model.parameters(), lr=N_PRE_LR,
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
        loss = loss / max(step, 1)   # :157 — /step, not /(step+1)
        if float(loss) < best:
            best, cnt_wait = float(loss), 0
            best_state = copy.deepcopy(model.state_dict())
        else:
            cnt_wait += 1
        if cnt_wait == N_PRE_PATIENCE:
            break
        loss.backward()
        optimiser.step()
    model.load_state_dict(best_state)
    model.eval()
    return model, best


def reference_graph_fewshot_pretrain(ref, dataset):
    """``RAGraph_graph_fewshot/pretrain.py`` at matched tiny config."""
    import random

    process = ref.gfewshot_process
    aug = ref.gfewshot_aug
    PrePrompt = ref.gfewshot_preprompt.PrePrompt
    prompt_pretrain_sample = ref.gfewshot_preprompt.prompt_pretrain_sample

    random.seed(PRE_SEED)
    np.random.seed(PRE_SEED)
    torch.manual_seed(PRE_SEED)

    loader = FakeLoader(dataset, batch_size=G_PRE_BATCH, shuffle=True,
                        drop_last=True)
    model = PrePrompt(dataset.num_node_attributes, HID, "prelu", 2, 0.3)
    best, best_state, cnt_wait = 1e9, None, 0
    for _epoch in range(G_PRE_EPOCHS):
        np.random.seed(PRE_SEED)    # :76-77 — np+torch only
        torch.manual_seed(PRE_SEED)
        loss = 0
        step = 0
        for step, data in enumerate(loader):
            features, adj = process.process_tu(data, NB_CLASSES,
                                               dataset.num_node_attributes)
            negative_sample = prompt_pretrain_sample(adj, G_LP_SAMPLES)
            nb_nodes = features.shape[0]
            features = torch.FloatTensor(np.asarray(features)[np.newaxis])
            aug_adj1 = aug.aug_random_edge(adj, drop_percent=0.1)
            aug_adj2 = aug.aug_random_edge(adj, drop_percent=0.1)
            adj_n = process.normalize_adj(adj + sp.eye(adj.shape[0]))
            aug_adj1 = process.normalize_adj(
                aug_adj1 + sp.eye(aug_adj1.shape[0]))
            aug_adj2 = process.normalize_adj(
                aug_adj2 + sp.eye(aug_adj2.shape[0]))
            # the sparse=False branch re-adds the identity on top of the
            # normalized adjacency (graph-tree quirk)
            adj_t = torch.FloatTensor(np.asarray(
                (adj_n + sp.eye(adj_n.shape[0])).todense())[np.newaxis])
            aug1_t = torch.FloatTensor(np.asarray(
                (aug_adj1 + sp.eye(aug_adj1.shape[0])).todense())[np.newaxis])
            aug2_t = torch.FloatTensor(np.asarray(
                (aug_adj2 + sp.eye(aug_adj2.shape[0])).todense())[np.newaxis])
            optimiser = torch.optim.Adam(model.parameters(), lr=G_PRE_LR,
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
        if cnt_wait == G_PRE_PATIENCE:
            break
        loss.backward()
        optimiser.step()
    model.load_state_dict(best_state)
    model.eval()
    return model, best


# ---------------------------------------------------------------------------
# reference finetune drivers
# ---------------------------------------------------------------------------
def _patch_dataloader(RAGraph):
    tgb_cls = RAGraph.__init__.__globals__["ToyGraphBase"]
    tgb_cls.build_toy_graph.__globals__["DataLoader"] = FakeLoader


def reference_node_fewshot_finetune(ref, dataset, pre_model, support_dir):
    """``RAGraph_node_fewshot/finetune-rag.py:52-149``."""
    util = ref.fewshot_utility
    RAGraph = ref.fewshot_RAGraph
    _patch_dataloader(RAGraph)

    accs = []
    for i in range(TEST_TIMES):
        util.seed_everything(i)
        dataset = dataset.shuffle()
        train_ds = dataset[:int(0.5 * len(dataset))]
        val_ds = dataset[int(0.5 * len(dataset)):int(0.8 * len(dataset))]
        test_ds = dataset[int(0.8 * len(dataset)):]

        d = np.load(os.path.join(support_dir, f"{i}.npz"))
        fs_feat = torch.FloatTensor(d["features"])
        fs_adj = torch.FloatTensor(d["adj"])
        fs_lbl = torch.tensor(d["labels"]).type(torch.long).squeeze()

        fewshot_logits = pre_model.inference(fs_feat, fs_adj)
        mean_fw = util.fewshot_mean_logits(fewshot_logits, fs_lbl)

        rag = RAGraph(pre_model, resource_dataset=train_ds,
                      mean_fewshot_logits=mean_fw, emb_size=HID,
                      finetune=True, noise_finetune=False)

        rag.train()
        pre_model.gcn.convs[0].eval()   # :79
        best_loss, best_state, trigger = float("inf"), None, 0
        val_loader = FakeLoader(val_ds, batch_size=N_BATCH, shuffle=True)
        opt = torch.optim.Adam(rag.parameters(), lr=N_DOWN_LR,
                               weight_decay=N_DOWN_WD)
        for _epoch in range(N_DOWN_EPOCHS):
            total_loss = 0.0
            for data in val_loader:
                features, adj, node_labels = util.process_tu_dataset(
                    data, dataset.num_node_attributes)
                opt.zero_grad()
                # prototypes recomputed inside the step (:96-97)
                fewshot_logits = pre_model.inference(fs_feat, fs_adj)
                mean_fw = util.fewshot_mean_logits(fewshot_logits, fs_lbl)
                logits = rag(features, adj, mean_fw)
                predict_logits = util.fewshot_predict_logits(mean_fw, logits)
                loss = torch.nn.functional.cross_entropy(predict_logits,
                                                         node_labels)
                total_loss += loss.item()
                loss.backward()
                opt.step()
            epoch_loss = total_loss / len(val_loader)
            if epoch_loss < best_loss:
                best_loss, trigger = epoch_loss, 0
                best_state = copy.deepcopy(rag.state_dict())
            else:
                trigger += 1
                if trigger >= N_DOWN_PATIENCE:
                    break

        rag.load_state_dict(best_state)
        rag.eval()
        rag.toy_graph_base.build_toy_graph(val_ds)   # append, no reset

        fewshot_logits = pre_model.inference(fs_feat, fs_adj)
        mean_fw = util.fewshot_mean_logits(fewshot_logits, fs_lbl)

        correct = total = 0
        test_loader = FakeLoader(test_ds, batch_size=N_BATCH, shuffle=True)
        with torch.no_grad():
            for data in test_loader:
                features, adj, node_labels = util.process_tu_dataset(
                    data, dataset.num_node_attributes)
                logits = rag(features, adj, mean_fw)
                pred = util.fewshot_predict_labels_by_mean(mean_fw, logits)
                gold = torch.argmax(node_labels, dim=1)
                correct += int(torch.sum(pred == gold))
                total += len(gold)
        acc = 100.0 * correct / total
        print(f"[reference] task {i + 1}/{TEST_TIMES}: accuracy {acc:.4f}")
        accs.append(acc)
    arr = np.array(accs)
    return float(arr.mean()), float(arr.std()), accs


def reference_graph_fewshot_finetune(ref, dataset, pre_model, support_npz):
    """``RAGraph_graph_fewshot/finetune-rag.py:79-190`` (fewshot helpers
    from the node tree — the graph tree's fewshot_utility.py is absent
    from the snapshot)."""
    util = ref.gfewshot_utility
    fw = ref.fewshot_utility
    RAGraph = ref.gfewshot_RAGraph
    _patch_dataloader(RAGraph)

    d = np.load(support_npz)
    fs_feat = torch.FloatTensor(d["features"])
    fs_adj = torch.FloatTensor(d["adj"])
    fs_lbl = torch.tensor(d["labels"]).long()
    fs_len = torch.tensor(d["graph_len"]).long()

    def calculate_mean_logits(model):
        """finetune-rag.py:62-76 — graph_len cursor loop."""
        node_logits = model.inference(fs_feat, fs_adj)
        start = 0
        graph_logits = torch.zeros(fs_lbl.shape[0], HID)
        for gi, glen in enumerate(fs_len):
            end = start + int(glen)
            graph_logits[gi, :] = node_logits[start:end].mean(0)
            start = end
        return fw.fewshot_mean_logits(graph_logits, fs_lbl)

    accs = []
    for i in range(TEST_TIMES):
        util.seed_everything(i)
        dataset = dataset.shuffle()
        train_ds = dataset[:int(0.5 * len(dataset))]
        val_ds = dataset[int(0.5 * len(dataset)):int(0.8 * len(dataset))]
        test_ds = dataset[int(0.8 * len(dataset)):]

        rag = RAGraph(pre_model, resource_dataset=train_ds,
                      feture_size=dataset.num_node_attributes,
                      num_class=NB_CLASSES, emb_size=HID,
                      finetune=True, noise_finetune=False)

        rag.train()
        pre_model.gcn.convs[0].eval()
        best_loss, best_state, trigger = float("inf"), None, 0
        val_loader = FakeLoader(val_ds, batch_size=G_BATCH, shuffle=True)
        opt = torch.optim.Adam(rag.parameters(), lr=G_DOWN_LR)  # no wd
        for _epoch in range(G_DOWN_EPOCHS):
            total_loss = 0.0
            for data in val_loader:
                features, adj = util.process_tu_dataset(
                    data, NB_CLASSES, dataset.num_node_attributes)
                opt.zero_grad()
                mean_fw = calculate_mean_logits(pre_model)
                logits = rag(features, adj, mean_fw)
                predict_logits = fw.fewshot_predict_logits(mean_fw, logits)
                graph_label = torch.nn.functional.one_hot(
                    data.y, num_classes=NB_CLASSES).float()
                loss = torch.nn.functional.cross_entropy(predict_logits,
                                                         graph_label)
                total_loss += loss.item()
                loss.backward()
                opt.step()
            epoch_loss = total_loss / len(val_loader)
            if epoch_loss < best_loss:
                best_loss, trigger = epoch_loss, 0
                best_state = copy.deepcopy(rag.state_dict())
            else:
                trigger += 1
                if trigger >= G_DOWN_PATIENCE:
                    break

        rag.load_state_dict(best_state)
        rag.eval()
        rag.toy_graph_base.build_toy_graph(val_ds)

        mean_fw = calculate_mean_logits(pre_model)

        correct = total = 0
        test_loader = FakeLoader(test_ds, batch_size=G_BATCH, shuffle=True)
        with torch.no_grad():
            for data in test_loader:
                features, adj = util.process_tu_dataset(
                    data, NB_CLASSES, dataset.num_node_attributes)
                logits = rag(features, adj, mean_fw)
                pred = fw.fewshot_predict_labels_by_mean(mean_fw, logits)
                correct += int(torch.sum(pred == data.y))
                total += len(data.y)
        acc = 100.0 * correct / total
        print(f"[reference] task {i + 1}/{TEST_TIMES}: accuracy {acc:.4f}")
        accs.append(acc)
    arr = np.array(accs)
    return float(arr.mean()), float(arr.std()), accs


def _write_graph_support_pt(workdir, name, support_npz):
    """The graph RAGraph constructor's FewShotBase torch.loads
    ``data/fewshot_{name}_graph/testset/*.pt`` (FewShotBase.py:9-13);
    write the REAL shared support there — the same tensors the driver
    itself loads."""
    d = np.load(support_npz)
    out = os.path.join(workdir, "data", f"fewshot_{name}_graph", "testset")
    os.makedirs(out, exist_ok=True)
    torch.save(torch.FloatTensor(d["adj"]), os.path.join(out, "adj.pt"))
    torch.save(torch.FloatTensor(d["features"]),
               os.path.join(out, "feature.pt"))
    torch.save(torch.tensor(d["labels"]).long(),
               os.path.join(out, "labels.pt"))
    torch.save(torch.tensor(d["graph_len"]).long(),
               os.path.join(out, "graph_len.pt"))


def _se(ref_accs, our_accs):
    n = min(len(ref_accs), len(our_accs))
    return float(np.sqrt(np.var(ref_accs, ddof=1) / n
                         + np.var(our_accs, ddof=1) / n))


def _emit(tag, config, ref_tuple, ours, pre_best, ours_protocol):
    ref_mean, ref_std, ref_accs = ref_tuple
    gap = ours["mean"] - ref_mean
    se = _se(ref_accs, ours["accuracy"])
    out = {
        "config": config,
        "reference": {"mean": ref_mean, "std": ref_std,
                      "accuracy": ref_accs,
                      "pretrain_best_loss": pre_best,
                      "protocol": f"RAGraph_{tag}/pretrain.py + "
                                  "finetune-rag.py (torch-CPU, fake-PyG "
                                  "scaffolding, shared exported supports)"},
        "ours": {"mean": ours["mean"], "std": ours["std"],
                 "accuracy": ours["accuracy"], "protocol": ours_protocol},
        "gap_pp": gap,
        "gap_se_pp": se,
        "gap_sigma": gap / max(se, 1e-12),
        "within_seed_noise": bool(abs(gap) <= 2.0 * se),
    }
    short = "node" if tag == "node_fewshot" else "graph"
    path = f"results/reference_e2e_differential_fewshot_{short}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("gap_pp", "gap_se_pp", "gap_sigma",
                       "within_seed_noise")}))
    return out


def run_node(ref=None, ds=None, fake=None):
    _force_cpu()
    from _reference_loader import load_fewshot_driver

    from ragraph_tpu.cli import fewshot as fewshot_cli
    from ragraph_tpu.cli import node as node_cli
    from ragraph_tpu.data.fewshot_export import export_fewshot_splits

    ds = ds or synth_hard()
    fake = fake or to_fake_dataset(ds)
    fake.name = "ENZYMES"   # weight-table masquerade (see module docstring)
    ref = ref or load_fewshot_driver()
    _neutralize_fewshot_asserts(ref)

    support_dir = os.path.join("results", "fewshot_diff_supports_node")
    export_fewshot_splits(ds, support_dir, shots=SHOTS,
                          num_tasks=TEST_TIMES, seed=0)

    t0 = time.time()
    pre_model, pre_best = reference_node_fewshot_pretrain(ref, fake)
    print(f"[reference] pretrain best loss {pre_best:.4f} "
          f"({time.time() - t0:.0f}s)")
    t0 = time.time()
    ref_tuple = reference_node_fewshot_finetune(ref, fake, pre_model,
                                                support_dir)
    print(f"[reference] mean {ref_tuple[0]:.4f} std {ref_tuple[1]:.4f} "
          f"({time.time() - t0:.0f}s)")

    save_dir = os.path.join("results", "fewshot_diff_modelset_node")
    t0 = time.time()
    node_cli.main(["pretrain", "--dataset", "SYNTH-HARD",
                   "--hidden", str(HID), "--batch-size", str(N_PRE_BATCH),
                   "--pretrain-epochs", "50", "--lr", str(N_PRE_LR),
                   "--encoder-layers", "2", "--seed", str(PRE_SEED),
                   "--save-dir", save_dir])
    ours_mean = fewshot_cli.main([
        "finetune", "--dataset", "SYNTH-HARD", "--hidden", str(HID),
        "--batch-size", str(N_BATCH), "--epochs", str(N_DOWN_EPOCHS),
        "--lr", str(N_DOWN_LR), "--weight-decay", str(N_DOWN_WD),
        "--patience", str(N_DOWN_PATIENCE), "--shots", str(SHOTS),
        "--test-times", str(TEST_TIMES), "--support-dir", support_dir,
        "--retrieve-weight", str(N_RW), "--label-weight", str(N_LW),
        "--save-dir", save_dir, "--library-capacity", "16384"])
    with open(f"results/fewshot_finetune_node_SYNTH-HARD_shot{SHOTS}"
              ".json") as f:
        ours = json.load(f)
    print(f"[ours] mean {ours['mean']:.4f} std {ours['std']:.4f} "
          f"({time.time() - t0:.0f}s)  (returned {ours_mean:.4f})")

    config = {"hidden": HID, "shots": SHOTS, "batch": N_BATCH,
              "downstream_epochs": N_DOWN_EPOCHS, "downstream_lr": N_DOWN_LR,
              "weight_decay": N_DOWN_WD, "patience": N_DOWN_PATIENCE,
              "test_times": TEST_TIMES,
              "data": "SYNTH-HARD (120 graphs, 3 classes, feat 16, "
                      "signal 0.6)"}
    return _emit("node_fewshot", config, ref_tuple, ours, pre_best,
                 "cli.node pretrain --encoder-layers 2 + cli.fewshot "
                 "finetune --support-dir")


def run_graph(ref=None, ds=None, fake=None):
    _force_cpu()
    from _reference_loader import load_fewshot_driver

    from ragraph_tpu.cli import fewshot as fewshot_cli
    from ragraph_tpu.cli import node as node_cli
    from ragraph_tpu.data.fewshot_export import export_fewshot_graph_split

    ds = ds or synth_hard()
    fake = fake or to_fake_dataset(ds)
    fake.name = "ENZYMES"
    ref = ref or load_fewshot_driver()
    _neutralize_fewshot_asserts(ref)

    support_dir = os.path.join("results", "fewshot_diff_supports_graph")
    support_npz = os.path.join(support_dir, "support.npz")
    export_fewshot_graph_split(ds, support_npz, shots=SHOTS, seed=0)

    t0 = time.time()
    pre_model, pre_best = reference_graph_fewshot_pretrain(ref, fake)
    print(f"[reference] pretrain best loss {pre_best:.4f} "
          f"({time.time() - t0:.0f}s)")

    support_abs = os.path.abspath(support_npz)
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as tmp:
        _write_graph_support_pt(tmp, fake.name, support_abs)
        os.chdir(tmp)
        try:
            t0 = time.time()
            ref_tuple = reference_graph_fewshot_finetune(
                ref, fake, pre_model, support_abs)
        finally:
            os.chdir(cwd)
    print(f"[reference] mean {ref_tuple[0]:.4f} std {ref_tuple[1]:.4f} "
          f"({time.time() - t0:.0f}s)")

    save_dir = os.path.join("results", "fewshot_diff_modelset_graph")
    t0 = time.time()
    node_cli.main(["pretrain", "--dataset", "SYNTH-HARD",
                   "--hidden", str(HID), "--batch-size", str(G_PRE_BATCH),
                   "--pretrain-epochs", str(G_PRE_EPOCHS),
                   "--lr", str(G_PRE_LR), "--lp-samples",
                   str(G_LP_SAMPLES), "--encoder-layers", "2",
                   "--seed", str(PRE_SEED), "--save-dir", save_dir])
    def _ours_finetune():
        return fewshot_cli.main([
            "finetune", "--dataset", "SYNTH-HARD", "--level", "graph",
            "--hidden", str(HID), "--batch-size", str(G_BATCH),
            "--epochs", str(G_DOWN_EPOCHS), "--lr", str(G_DOWN_LR),
            "--weight-decay", "0.0", "--patience", str(G_DOWN_PATIENCE),
            "--shots", str(SHOTS), "--test-times", str(TEST_TIMES),
            "--support-dir", support_dir,
            "--retrieve-weight", str(G_RW), "--label-weight", str(G_LW),
            "--save-dir", save_dir, "--library-capacity", "16384"])

    ours_mean = _ours_finetune()
    res_path = (f"results/fewshot_finetune_graph_SYNTH-HARD_shot{SHOTS}"
                ".json")
    with open(res_path) as f:
        ours = json.load(f)
    print(f"[ours] mean {ours['mean']:.4f} std {ours['std']:.4f} "
          f"({time.time() - t0:.0f}s)  (returned {ours_mean:.4f})")

    # matched-OPTIMIZER-UPDATES arm: the reference pretrain makes ONE
    # summed-loss Adam update per epoch (10 total at the shipped
    # nb_epochs=10); our CLI updates per batch (15/epoch), so nominal
    # --pretrain-epochs 10 gives our encoder 15x the updates — enough to
    # put ours AHEAD of the reference outside 2 SE on SYNTH-HARD. With
    # --pretrain-epochs 1 (15 updates ~ their 10) the gap collapses into
    # seed noise, pinning the excess on pretrain update count, not on a
    # pipeline mismatch.
    node_cli.main(["pretrain", "--dataset", "SYNTH-HARD",
                   "--hidden", str(HID), "--batch-size", str(G_PRE_BATCH),
                   "--pretrain-epochs", "1",
                   "--lr", str(G_PRE_LR), "--lp-samples",
                   str(G_LP_SAMPLES), "--encoder-layers", "2",
                   "--seed", str(PRE_SEED), "--save-dir", save_dir])
    _ours_finetune()
    with open(res_path) as f:
        ours_matched = json.load(f)
    print(f"[ours, matched-updates] mean {ours_matched['mean']:.4f} "
          f"std {ours_matched['std']:.4f}")

    config = {"hidden": HID, "shots": SHOTS, "batch": G_BATCH,
              "downstream_epochs": G_DOWN_EPOCHS, "downstream_lr": G_DOWN_LR,
              "weight_decay": 0.0, "patience": G_DOWN_PATIENCE,
              "test_times": TEST_TIMES,
              "data": "SYNTH-HARD (120 graphs, 3 classes, feat 16, "
                      "signal 0.6) — graph level"}
    out = _emit("graph_fewshot", config, ref_tuple, ours, pre_best,
                "cli.node pretrain --encoder-layers 2 + cli.fewshot "
                "finetune --level graph --support-dir")
    # HEADLINE = the matched-optimizer-updates arm (r4 verdict item 4,
    # deviation documented in docs/PARITY.md "pretrain update count"):
    # the nominal arm compares our per-batch Adam (~150 updates) against
    # the reference's one-backward-per-epoch schedule (10 updates), so
    # its gap measures update count, not pipeline fidelity. The nominal
    # arm is preserved as the secondary `nominal` record.
    out["nominal"] = {
        "note": "--pretrain-epochs 10 (CLI default): our per-batch Adam "
                "gives the encoder ~150 updates vs the reference's 10 "
                "one-per-epoch updates (RAGraph_graph_fewshot/pretrain.py "
                "summed-loss single backward) — ours lands AHEAD outside "
                "2 SE on excess updates alone; see docs/PARITY.md",
        "ours_mean": out["ours"]["mean"],
        "ours_std": out["ours"]["std"],
        "ours_accuracy": out["ours"]["accuracy"],
        "gap_pp": out["gap_pp"],
        "gap_se_pp": out["gap_se_pp"],
        "gap_sigma": out["gap_sigma"],
        "within_seed_noise": out["within_seed_noise"],
    }
    m_gap = ours_matched["mean"] - ref_tuple[0]
    m_se = _se(ref_tuple[2], ours_matched["accuracy"])
    out["headline_arm"] = "matched_updates (--pretrain-epochs 1: ~15 " \
        "Adam updates vs the reference's 10)"
    out["ours"] = {"mean": ours_matched["mean"],
                   "std": ours_matched["std"],
                   "accuracy": ours_matched["accuracy"],
                   "protocol": "cli.node pretrain --encoder-layers 2 "
                               "--pretrain-epochs 1 (matched optimizer "
                               "updates) + cli.fewshot finetune --level "
                               "graph --support-dir"}
    out["gap_pp"] = m_gap
    out["gap_se_pp"] = m_se
    out["gap_sigma"] = m_gap / max(m_se, 1e-12)
    out["within_seed_noise"] = bool(abs(m_gap) <= 2.0 * m_se)
    out["ours_ahead"] = bool(out["gap_pp"] > 0)
    path = "results/reference_e2e_differential_fewshot_graph.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"headline_gap_sigma": out["gap_sigma"],
                      "headline_within": out["within_seed_noise"],
                      "nominal_gap_sigma": out["nominal"]["gap_sigma"]}))
    return out


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    os.makedirs("results", exist_ok=True)
    if mode in ("node", "all"):
        run_node()
    if mode in ("graph", "all"):
        run_graph()
