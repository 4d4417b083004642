"""Static-shape graph containers.

The reference materializes ragged dense ``(N, N)`` adjacencies per batch
(``RAGraph_node/ragraph_utils/utility.py:30-72``) and grows library tensors
with ``torch.cat``. Under XLA everything must have a static shape, so the
TPU-native containers here are *padded*: a graph batch is padded to a fixed
node budget and carries an explicit node mask; padding rows are all-zero in
the normalized adjacency, which makes them inert under message passing.

Two representations:

- :class:`DenseGraph` — padded dense normalized adjacency. The TU graphs the
  reference targets are tiny (tens of nodes; a batch of 16 is a few hundred
  nodes), so a dense block-diagonal adjacency maps directly onto the MXU and
  is the fastest possible message-passing layout at this scale.
- :class:`EdgeGraph` — padded COO edge list + per-edge weights, aggregated
  with segment sums. This is the scalable layout used by the edge/recsys
  pipeline (bipartite graphs with millions of edges,
  ``RAGraph_edge/modules/RAGraph.py:232-240``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls=None, *, meta_fields=()):
    """Register a frozen dataclass as a JAX pytree.

    Fields named in ``meta_fields`` are static (hashable) auxiliary data;
    everything else is a traced leaf.
    """
    if cls is None:
        return lambda c: _pytree_dataclass(c, meta_fields=meta_fields)
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = [f.name for f in dataclasses.fields(cls)
                   if f.name not in meta_fields]
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=list(meta_fields))
    return cls


@_pytree_dataclass
class DenseGraph:
    """A padded (batch of) graph(s) with a dense normalized adjacency.

    Attributes:
      features:  ``(N, F)`` float — node features; zero rows in padding.
      adj:       ``(N, N)`` float — symmetrically normalized adjacency
                 ``D^-1/2 (A + I) D^-1/2`` restricted to real nodes; padding
                 rows/cols are zero.
      node_mask: ``(N,)`` bool — True for real nodes.
      labels:    ``(N, C)`` float — one-hot node labels (zero in padding).
      graph_ids: ``(N,)`` int32 — which graph each node belongs to (for
                 block-diagonal batches); padding nodes get ``num_graphs``.
      num_graphs: python int — number of real graphs in the batch (static).
    """

    features: jax.Array
    adj: jax.Array
    node_mask: jax.Array
    labels: jax.Array
    graph_ids: jax.Array
    num_graphs: jax.Array  # scalar int32 (traced-safe)

    @property
    def num_nodes_padded(self) -> int:
        return self.features.shape[0]

    @property
    def feature_dim(self) -> int:
        return self.features.shape[1]

    @property
    def num_classes(self) -> int:
        return self.labels.shape[1]


@_pytree_dataclass(meta_fields=("num_nodes",))
class EdgeGraph:
    """A padded edge-list graph for segment-sum message passing.

    Attributes:
      senders:   ``(E,)`` int32 — source node of each edge; padding edges
                 point at node ``num_nodes`` (a dump row) or are masked.
      receivers: ``(E,)`` int32 — destination node of each edge.
      weights:   ``(E,)`` float — per-edge normalization (e.g. binorm
                 ``d_u^-1/2 d_i^-1/2``); zero on padding edges.
      edge_mask: ``(E,)`` bool — True for real edges.
      num_nodes: python int — static node count (row budget for segment sums).
    """

    senders: jax.Array
    receivers: jax.Array
    weights: jax.Array
    edge_mask: jax.Array
    num_nodes: int

    @property
    def num_edges_padded(self) -> int:
        return self.senders.shape[0]


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m`` (TPU lane/sublane alignment)."""
    return ((x + m - 1) // m) * m


def normalize_adj_dense(adj: jax.Array, node_mask: jax.Array | None = None,
                        add_self_loops: bool = True) -> jax.Array:
    """Symmetric normalization ``D^-1/2 (A [+ I]) D^-1/2`` on a dense batch.

    Mirrors ``RAGraph_node/ragraph_utils/utility.py:19-26`` (scipy version)
    but fully on-device and mask-aware: padding rows/cols stay zero and do
    not receive self-loops, so they are inert under message passing.
    """
    if node_mask is None:
        node_mask = jnp.ones((adj.shape[0],), dtype=bool)
    maskf = node_mask.astype(adj.dtype)
    if add_self_loops:
        adj = adj + jnp.diag(maskf)
    adj = adj * maskf[:, None] * maskf[None, :]
    rowsum = adj.sum(axis=1)
    d_inv_sqrt = jnp.where(rowsum > 0, jax.lax.rsqrt(jnp.maximum(rowsum, 1e-12)), 0.0)
    return adj * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]


def row_normalize_adj(adj: jax.Array) -> jax.Array:
    """Row normalization ``D^-1 A`` with zero-degree guard.

    Mirrors ``RAGraph_node/ragraph_utils/Propagation.py:15-16`` (``adj /
    degree``), which in the reference divides by zero for isolated nodes;
    here zero-degree rows simply stay zero.
    """
    degree = adj.sum(axis=1, keepdims=True)
    return jnp.where(degree > 0, adj / jnp.maximum(degree, 1e-12), 0.0)


def dense_batch_from_graphs(
    features_list: list[np.ndarray],
    adj_list: list[np.ndarray],
    labels_list: list[np.ndarray],
    pad_nodes: int,
    num_classes: int | None = None,
    return_host_adj: bool = False,
):
    """Assemble a block-diagonal padded :class:`DenseGraph` on the host.

    The TPU analog of ``process_tu_dataset``
    (``RAGraph_node/ragraph_utils/utility.py:30-72``): stacks per-graph
    features/labels, block-diagonalizes raw adjacencies, then applies the
    symmetric ``A+I`` normalization — but into a *fixed* node budget
    ``pad_nodes`` so the downstream computation compiles once per bucket.
    """
    n_real = sum(f.shape[0] for f in features_list)
    if n_real > pad_nodes:
        raise ValueError(f"batch has {n_real} nodes > pad budget {pad_nodes}")
    fdim = features_list[0].shape[1]
    cdim = num_classes if num_classes is not None else labels_list[0].shape[1]

    features = np.zeros((pad_nodes, fdim), dtype=np.float32)
    adj = np.zeros((pad_nodes, pad_nodes), dtype=np.float32)
    labels = np.zeros((pad_nodes, cdim), dtype=np.float32)
    graph_ids = np.full((pad_nodes,), len(features_list), dtype=np.int32)
    mask = np.zeros((pad_nodes,), dtype=bool)

    off = 0
    for gid, (f, a, y) in enumerate(zip(features_list, adj_list, labels_list)):
        n = f.shape[0]
        features[off:off + n] = f
        adj[off:off + n, off:off + n] = a
        labels[off:off + n, :y.shape[1]] = y
        graph_ids[off:off + n] = gid
        mask[off:off + n] = True
        off += n

    g = DenseGraph(
        features=jnp.asarray(features),
        adj=jnp.asarray(adj),
        node_mask=jnp.asarray(mask),
        labels=jnp.asarray(labels),
        graph_ids=jnp.asarray(graph_ids),
        num_graphs=jnp.asarray(len(features_list), dtype=jnp.int32),
    )
    g = dataclasses.replace(
        g, adj=normalize_adj_dense(g.adj, g.node_mask, add_self_loops=True)
    )
    if return_host_adj:
        # the raw block-diagonal adjacency is free here on the host;
        # callers that need raw structure (e.g. negative-sample mining)
        # must NOT reconstruct it from the device array — pulling the
        # (pad, pad) adjacency back through the ~100 KB/s tunnel costs
        # seconds per batch.
        return g, adj
    return g


@partial(jax.jit, static_argnames=("num_segments",))
def segment_mean(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                 mask: jax.Array | None = None) -> jax.Array:
    """Masked per-segment mean (used for graph-level pooling of node rows)."""
    if mask is not None:
        data = data * mask.astype(data.dtype)[:, None]
        ones = mask.astype(data.dtype)
    else:
        ones = jnp.ones((data.shape[0],), data.dtype)
    sums = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    counts = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    return sums / jnp.maximum(counts, 1.0)[:, None]
