"""Host-side batch assembly: ragged graphs -> static padded device arrays.

Two layouts:

- **Flat block-diagonal** (:func:`flat_batches`) — one ``DenseGraph`` per
  batch, nodes of all graphs stacked with a block-diag adjacency. This is
  the reference's training/eval layout
  (``process_tu_dataset``, ``RAGraph_node/ragraph_utils/utility.py:30-72``)
  padded to a fixed node budget so jit compiles once.
- **Stacked** (:func:`stacked_batches`) — ``(B, N_pad, ...)`` per-graph
  tensors for the vmapped library build
  (:func:`ragraph_tpu.rag.library.build_entries_batch`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ragraph_tpu.core.graph import (DenseGraph, dense_batch_from_graphs,
                                    normalize_adj_dense, round_up)


def flat_batches(graphs, batch_size: int, pad_nodes: int | None = None,
                 num_classes: int | None = None,
                 with_host_adj: bool = False):
    """Yield block-diagonal padded :class:`DenseGraph` batches.

    ``pad_nodes`` defaults to a single bucket covering the worst-case batch
    (max total nodes over batches, rounded up to 128 for MXU alignment) so
    every batch compiles to the same program.

    ``with_host_adj=True`` yields ``(graph, raw_host_adj)`` pairs — the
    raw (un-normalized, numpy) block-diagonal adjacency for host-side
    consumers like negative-sample mining, so they never pull the device
    adjacency back through the slow tunnel.
    """
    chunks = [graphs[i:i + batch_size]
              for i in range(0, len(graphs), batch_size)]
    if pad_nodes is None:
        worst = max(sum(g.features.shape[0] for g in c) for c in chunks)
        pad_nodes = round_up(worst, 128)
    for chunk in chunks:
        yield dense_batch_from_graphs(
            [g.features for g in chunk],
            [g.adj for g in chunk],
            [g.node_labels for g in chunk],
            pad_nodes=pad_nodes,
            num_classes=num_classes,
            return_host_adj=with_host_adj,
        )


def compute_pad_nodes(graphs, batch_size: int, align: int = 128) -> int:
    chunks = [graphs[i:i + batch_size]
              for i in range(0, len(graphs), batch_size)]
    worst = max(sum(g.features.shape[0] for g in c) for c in chunks)
    return round_up(worst, align)


def stacked_batches(graphs, batch_size: int, pad_nodes: int | None = None,
                    num_classes: int | None = None,
                    num_graph_classes: int | None = None):
    """Yield dicts of stacked per-graph arrays for the vmapped library build.

    Keys: ``features (B,N,F)``, ``adj (B,N,N)`` (normalized, per-graph),
    ``labels (B,N,C)``, ``node_mask (B,N)``, ``graph_onehot (B,Cg)``.
    The final short batch is padded with empty graphs (all-False masks) so
    B is constant.
    """
    if pad_nodes is None:
        worst = max(g.features.shape[0] for g in graphs)
        pad_nodes = round_up(max(worst, 8), 8)
    fdim = graphs[0].features.shape[1]
    cdim = num_classes if num_classes is not None else graphs[0].node_labels.shape[1]
    cg = num_graph_classes if num_graph_classes is not None else cdim

    for i in range(0, len(graphs), batch_size):
        chunk = graphs[i:i + batch_size]
        b = batch_size
        features = np.zeros((b, pad_nodes, fdim), np.float32)
        adj = np.zeros((b, pad_nodes, pad_nodes), np.float32)
        labels = np.zeros((b, pad_nodes, cdim), np.float32)
        mask = np.zeros((b, pad_nodes), bool)
        graph_onehot = np.zeros((b, cg), np.float32)
        for j, g in enumerate(chunk):
            n = g.features.shape[0]
            features[j, :n] = g.features
            adj[j, :n, :n] = g.adj
            labels[j, :n, :g.node_labels.shape[1]] = g.node_labels
            mask[j, :n] = True
            graph_onehot[j, g.graph_label] = 1.0
        adj_j = jnp.asarray(adj)
        mask_j = jnp.asarray(mask)
        # normalize each graph's adjacency (A+I sym-norm), vectorized
        adj_n = jax.vmap(lambda a, m: normalize_adj_dense(a, m))(adj_j, mask_j)
        yield {
            "features": jnp.asarray(features),
            "adj": adj_n,
            "labels": jnp.asarray(labels),
            "node_mask": mask_j,
            "graph_onehot": jnp.asarray(graph_onehot),
        }
