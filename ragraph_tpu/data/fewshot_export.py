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


def load_fewshot_split(path: str):
    """Load one exported split -> FewshotSupportSet-compatible arrays."""
    data = np.load(path)
    return data["features"], data["labels"], data["adj"]
