"""Model-parallel edge propagation: receiver-range sharding + the fused
Pallas kernel per device.

Why this exists: the single-chip hot path
(:func:`ragraph_tpu.ops.pallas_segment.gather_scale_segsum`) is a Pallas
custom-VJP op — GSPMD cannot auto-partition it, so a jit-with-sharded-
tables edge step silently degrades to XLA's scatter-add propagation on
multi-chip. This module makes the sharding EXPLICIT with ``shard_map``:

- Edges (receiver-sorted, as everywhere in the edge family) are split
  into per-device RECEIVER RANGES — contiguous row blocks of the output,
  so each device's segment-sum is a purely local fused-kernel call.
  Per-shard edge counts differ; shards are padded to the max with
  zero-weight edges pointing at the shard's LAST local row (inert under
  the weighted reduce).
- The embedding table enters row-sharded (``P("idx")``) and is
  all-gathered per layer inside the shard_map (the standard ep-style
  table exchange: N·D bf16 over ICI; at 2M x 64 that is 32 MB/layer).
  The gather + weighted scan then run per device on E/n edges.
- Gradients: shard_map transposes the ``all_gather`` to a
  ``psum_scatter`` automatically, and the fused kernel's custom VJP
  (sender-order gather + sorted reduce) applies per shard unchanged.

Reference analog: none — the reference is single-GPU
(``RAGraph_edge/modules/RAGraph.py:232-240``); this is the TPU-native
scale-out of its propagation loop (SURVEY.md §5 "distributed
communication backend").
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ragraph_tpu.core.graph import _pytree_dataclass


@_pytree_dataclass(meta_fields=("num_nodes", "rows_per_shard",
                                "edges_per_shard"))
class ShardedEdges:
    """Receiver-range-sharded edge arrays (leading axis = shard).

    Every field is ``(n_shards, E_pad, ...)`` except ``recv_indptr``
    (``(n_shards, rows_per_shard + 1)``, LOCAL row indices). Sender ids
    stay GLOBAL (they index the all-gathered table); receiver-derived
    auxiliaries are local to the shard's row range.
    """

    senders: jax.Array          # (S, Ep) global node ids
    recv_indptr: jax.Array      # (S, rows+1) local CSR bounds
    weights: jax.Array          # (S, Ep) per-edge weights (0 = padding)
    # sender-order auxiliaries for the fused backward, per shard
    recv_of_send: jax.Array     # (S, Ep) LOCAL receiver ids, sender-sorted
    send_indptr: jax.Array      # (S, N+1) CSR bounds in sender order
    weights_send: jax.Array     # (S, Ep)
    num_nodes: int
    rows_per_shard: int
    edges_per_shard: int


def shard_edges_by_receiver(senders: np.ndarray, receivers: np.ndarray,
                            weights: np.ndarray, num_nodes: int,
                            n_shards: int) -> ShardedEdges:
    """Host-side prep: split receiver-sorted edges at row boundaries.

    ``num_nodes`` must divide by ``n_shards``; edges must be sorted by
    receiver. Pads each shard to the max shard size with zero-weight
    edges on the shard's LAST local row — padding must sit at the end of
    the receiver-sorted stream or the fused scan's sort invariant breaks.
    """
    assert num_nodes % n_shards == 0
    rows = num_nodes // n_shards
    order = np.argsort(receivers, kind="stable")
    senders = np.asarray(senders)[order]
    receivers = np.asarray(receivers)[order]
    weights = np.asarray(weights)[order]

    bounds = np.searchsorted(receivers, np.arange(0, num_nodes + 1, rows))
    e_pad = max(int(np.diff(bounds).max()), 1)

    s_send = np.zeros((n_shards, e_pad), np.int32)
    s_w = np.zeros((n_shards, e_pad), np.float32)
    s_rip = np.zeros((n_shards, rows + 1), np.int32)
    s_ros = np.zeros((n_shards, e_pad), np.int32)
    s_sip = np.zeros((n_shards, num_nodes + 1), np.int32)
    s_ws = np.zeros((n_shards, e_pad), np.float32)
    for s in range(n_shards):
        lo, hi = bounds[s], bounds[s + 1]
        n_e = hi - lo
        snd = np.zeros(e_pad, np.int32)          # pad senders -> node 0
        rcv_local = np.zeros(e_pad, np.int32)    # pad rows set below
        w = np.zeros(e_pad, np.float32)          # pad weight 0 (inert)
        snd[:n_e] = senders[lo:hi]
        rcv_local[:n_e] = receivers[lo:hi] - s * rows
        w[:n_e] = weights[lo:hi]
        # local CSR over the shard's rows; padding edges go to the LAST
        # local row (weight 0 — inert) so the receiver-sorted order stays
        # valid.
        rcv_local[n_e:] = rows - 1
        counts = np.bincount(rcv_local, minlength=rows)
        s_rip[s, 1:] = np.cumsum(counts)
        perm = np.argsort(snd, kind="stable")
        s_send[s] = snd
        s_w[s] = w
        s_ros[s] = rcv_local[perm]
        s_sip[s, 1:] = np.cumsum(np.bincount(snd, minlength=num_nodes))
        s_ws[s] = w[perm]
    return ShardedEdges(
        senders=jnp.asarray(s_send), recv_indptr=jnp.asarray(s_rip),
        weights=jnp.asarray(s_w), recv_of_send=jnp.asarray(s_ros),
        send_indptr=jnp.asarray(s_sip), weights_send=jnp.asarray(s_ws),
        num_nodes=num_nodes, rows_per_shard=rows, edges_per_shard=e_pad)


def sharded_lightgcn_propagate(mesh: Mesh, emb: jax.Array,
                               edges: ShardedEdges, num_layers: int,
                               axis_name: str = "idx", bf16: bool = True,
                               interpret: bool | None = None):
    """LightGCN layers over an ``axis_name``-sharded node table.

    ``emb`` is ``(N, D)`` sharded ``P(axis_name)`` over rows (replicated
    input also works — it is resharded). Returns the list
    ``[h0, h1, ..., hL]``, each sharded ``P(axis_name)`` over rows.
    """
    from ragraph_tpu.ops.pallas_segment import gather_scale_segsum

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def local(emb_shard, snd, rip, w, ros, sip, ws):
        # (1, ...) block per device -> drop the leading shard axis
        snd, rip, w = snd[0], rip[0], w[0]
        ros, sip, ws = ros[0], sip[0], ws[0]
        layers = [emb_shard]
        for _ in range(num_layers):
            # ep-style table exchange: every device needs arbitrary
            # sender rows, so gather the full table once per layer
            full = jax.lax.all_gather(layers[-1], axis_name, tiled=True)
            layers.append(gather_scale_segsum(
                full, w, ws, snd, rip, ros, sip, bf16=bf16,
                interpret=interpret))
        return tuple(layers)

    spec_rows = P(axis_name)
    in_specs = (spec_rows,) + (P(axis_name),) * 6
    out_specs = tuple(spec_rows for _ in range(num_layers + 1))
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=in_specs, out_specs=out_specs, check_vma=False)
    emb = jax.device_put(emb, NamedSharding(mesh, spec_rows))
    return list(fn(emb, edges.senders, edges.recv_indptr, edges.weights,
                   edges.recv_of_send, edges.send_indptr,
                   edges.weights_send))
