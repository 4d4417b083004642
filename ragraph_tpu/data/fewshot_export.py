"""K-shot split sampling and export.

Parity target: ``RAGraph_node/dataset.py`` (= fewshot variants) — the
one-off exporter that samples k-shot node subsets per class and writes
dense adjacency / feature / label tensors for the fewshot test sets
(``dataset.py:24-38`` sampler, ``:117-141`` exporter). Here the artifacts
are ``.npz`` files (no torch serialization) and the sampler is seeded
NumPy.
"""

from __future__ import annotations

import os

import numpy as np


def sample_k_shot_nodes(dataset, shots: int, num_classes: int,
                        rng: np.random.Generator):
    """Sample ``shots`` nodes per class across a TU-style dataset.

    Returns ``(features (S, F), labels (S,), adj (S, S))`` where the
    adjacency is the induced block-diagonal sub-adjacency of the sampled
    nodes (nodes sampled from different graphs are disconnected, matching
    the reference's per-graph extraction), symmetrically NORMALIZED with
    self-loops — the reference exports ``normalize_adj(adj + I)``
    (``RAGraph_node_fewshot/dataset.py:120``), and the consumer feeds it
    straight into ``inference``. Without the self-loops a sparse support
    set yields all-zero GCN outputs → zero class prototypes → the
    cosine-to-prototype head degenerates to chance (the r2 fewshot bug).
    """
    per_class = {c: [] for c in range(num_classes)}
    for gi, g in enumerate(dataset.graphs):
        y = g.node_labels.argmax(1) if g.node_labels.shape[1] else None
        if y is None:
            continue
        for ni in range(g.features.shape[0]):
            per_class[int(y[ni])].append((gi, ni))

    chosen = []
    for c in range(num_classes):
        pool = per_class[c]
        if not pool:
            continue
        idx = rng.choice(len(pool), size=min(shots, len(pool)),
                         replace=False)
        chosen.extend((pool[i], c) for i in idx)

    feats, labels = [], []
    n = len(chosen)
    adj = np.zeros((n, n), np.float32)
    for a, ((gi, ni), c) in enumerate(chosen):
        feats.append(dataset.graphs[gi].features[ni])
        labels.append(c)
        for b, ((gj, nj), _) in enumerate(chosen):
            if gi == gj and dataset.graphs[gi].adj[ni, nj] > 0:
                adj[a, b] = 1.0
    # normalize_adj(adj + I) (dataset.py:120): D^-1/2 (A+I) D^-1/2
    adj = adj + np.eye(n, dtype=np.float32)
    d = 1.0 / np.sqrt(np.maximum(adj.sum(1), 1e-12))
    adj = adj * d[:, None] * d[None, :]
    return np.stack(feats), np.asarray(labels, np.int64), adj


def export_fewshot_splits(dataset, out_dir: str, shots: int = 5,
                          num_tasks: int = 5, seed: int = 0):
    """Write ``num_tasks`` k-shot node splits as ``.npz`` files.

    Layout mirrors ``data/fewshot_<ds>/<k>shot_<ds>/<i>/`` from the
    reference: ``<out_dir>/<i>.npz`` with ``features/labels/adj``.
    """
    num_classes = max(dataset.num_node_classes, 1)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for task in range(num_tasks):
        rng = np.random.default_rng(seed + task)
        feats, labels, adj = sample_k_shot_nodes(dataset, shots,
                                                 num_classes, rng)
        path = os.path.join(out_dir, f"{task}.npz")
        np.savez(path, features=feats, labels=labels, adj=adj)
        paths.append(path)
    return paths


def export_fewshot_graph_split(dataset, out_path: str, shots: int = 5,
                               seed: int = 0):
    """Write ONE graph-level k-shot support set as ``.npz``.

    The reference's graph-fewshot driver loads a single support set
    shared by every task (``RAGraph_graph_fewshot/finetune-rag.py:51-55``
    — ``testset/{adj,feature,labels,graph_len}.pt``); this is the
    ``.npz`` equivalent consumed by ``cli.fewshot --support-dir``.
    """
    num_classes = max(dataset.num_graph_classes, 1)
    rng = np.random.default_rng(seed)
    feats, adj, labels, lens = sample_k_shot_graphs(dataset, shots,
                                                    num_classes, rng)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, features=feats, adj=adj, labels=labels,
             graph_len=lens)
    return out_path


def load_fewshot_split(path: str):
    """Load one exported split -> FewshotSupportSet-compatible arrays."""
    data = np.load(path)
    return data["features"], data["labels"], data["adj"]


def sample_k_shot_graphs(dataset, shots: int, num_classes: int,
                         rng: np.random.Generator):
    """Sample ``shots`` whole GRAPHS per graph class.

    Returns ``(features (N, F), adj (N, N), labels (G,), graph_len (G,))``
    in the graph-level fewshot test-set layout the reference loads from
    disk (``RAGraph_graph_fewshot/ragraph_utils/FewShotBase.py:9-13``,
    ``finetune-rag.py:50-54``): node features stacked over the sampled
    graphs, the block-diagonal adjacency symmetrically normalized with
    self-loops (the exporter pattern ``normalize_adj(adj + I)``,
    ``RAGraph_node_fewshot/dataset.py:120`` — for a block-diagonal matrix
    this equals per-graph normalization), one label per graph, and the
    per-graph node counts that drive the driver's mean-pool segmentation.
    The original per-task exports are stripped from the snapshot; this is
    the same sampling semantic applied at graph granularity."""
    per_class = {c: [] for c in range(num_classes)}
    for gi, g in enumerate(dataset.graphs):
        y = getattr(g, "graph_label", None)
        if y is None:
            continue
        per_class[int(y)].append(gi)

    chosen = []
    for c in range(num_classes):
        pool = per_class[c]
        if not pool:
            continue
        idx = rng.choice(len(pool), size=min(shots, len(pool)),
                         replace=False)
        chosen.extend((pool[i], c) for i in idx)

    feats, labels, lens, blocks = [], [], [], []
    for gi, c in chosen:
        g = dataset.graphs[gi]
        feats.append(g.features)
        labels.append(c)
        lens.append(g.features.shape[0])
        blocks.append(np.asarray(g.adj, np.float32))
    n = int(sum(lens))
    adj = np.zeros((n, n), np.float32)
    off = 0
    for b in blocks:
        m = b.shape[0]
        adj[off:off + m, off:off + m] = b
        off += m
    adj = adj + np.eye(n, dtype=np.float32)
    d = 1.0 / np.sqrt(np.maximum(adj.sum(1), 1e-12))
    adj = adj * d[:, None] * d[None, :]
    return (np.concatenate(feats, axis=0),
            adj,
            np.asarray(labels, np.int64),
            np.asarray(lens, np.int64))
