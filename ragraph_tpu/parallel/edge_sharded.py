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
    # Per-slot GLOBAL edge indices (positions in the caller's original
    # edge arrays) + validity masks, in both per-shard orders. These let
    # per-STEP weights (dropout masks, time-softmax folds — anything the
    # model computes over the global receiver-sorted stream each step) be
    # mapped onto the shards with one cheap scalar gather per order:
    # ``w_shard = where(valid, w_global[edge_gid], 0)``. Optional — static
    # -weight callers (the original API) never touch them.
    edge_gid: jax.Array | None = None        # (S, Ep) recv-order slots
    edge_gid_send: jax.Array | None = None   # (S, Ep) send-order slots
    valid: jax.Array | None = None           # (S, Ep) bool
    valid_send: jax.Array | None = None      # (S, Ep) bool


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
    s_gid = np.zeros((n_shards, e_pad), np.int32)
    s_gid_send = np.zeros((n_shards, e_pad), np.int32)
    s_valid = np.zeros((n_shards, e_pad), bool)
    s_valid_send = np.zeros((n_shards, e_pad), bool)
    for s in range(n_shards):
        lo, hi = bounds[s], bounds[s + 1]
        n_e = hi - lo
        snd = np.zeros(e_pad, np.int32)          # pad senders -> node 0
        rcv_local = np.zeros(e_pad, np.int32)    # pad rows set below
        w = np.zeros(e_pad, np.float32)          # pad weight 0 (inert)
        gid = np.zeros(e_pad, np.int32)          # original edge positions
        snd[:n_e] = senders[lo:hi]
        rcv_local[:n_e] = receivers[lo:hi] - s * rows
        w[:n_e] = weights[lo:hi]
        gid[:n_e] = order[lo:hi]
        # local CSR over the shard's rows; padding edges go to the LAST
        # local row (weight 0 — inert) so the receiver-sorted order stays
        # valid.
        rcv_local[n_e:] = rows - 1
        counts = np.bincount(rcv_local, minlength=rows)
        s_rip[s, 1:] = np.cumsum(counts)
        perm = np.argsort(snd, kind="stable")
        valid = np.arange(e_pad) < n_e
        s_send[s] = snd
        s_w[s] = w
        s_ros[s] = rcv_local[perm]
        s_sip[s, 1:] = np.cumsum(np.bincount(snd, minlength=num_nodes))
        s_ws[s] = w[perm]
        s_gid[s] = gid
        s_gid_send[s] = gid[perm]
        s_valid[s] = valid
        s_valid_send[s] = valid[perm]
    return ShardedEdges(
        senders=jnp.asarray(s_send), recv_indptr=jnp.asarray(s_rip),
        weights=jnp.asarray(s_w), recv_of_send=jnp.asarray(s_ros),
        send_indptr=jnp.asarray(s_sip), weights_send=jnp.asarray(s_ws),
        num_nodes=num_nodes, rows_per_shard=rows, edges_per_shard=e_pad,
        edge_gid=jnp.asarray(s_gid), edge_gid_send=jnp.asarray(s_gid_send),
        valid=jnp.asarray(s_valid), valid_send=jnp.asarray(s_valid_send))


def sharded_lightgcn_propagate(mesh: Mesh, emb: jax.Array,
                               edges: ShardedEdges, num_layers: int,
                               axis_name: str = "idx", bf16: bool = True,
                               interpret: bool | None = None,
                               weights: jax.Array | None = None,
                               weights_send: jax.Array | None = None):
    """LightGCN layers over an ``axis_name``-sharded node table.

    ``emb`` is ``(N, D)`` sharded ``P(axis_name)`` over rows (replicated
    input also works — it is resharded). Returns the list
    ``[h0, h1, ..., hL]``, each sharded ``P(axis_name)`` over rows.

    ``weights`` / ``weights_send`` override the static per-shard edge
    weights with per-STEP ``(S, Ep)`` arrays (dropout / time folds) —
    see :func:`sharded_propagate_per_step`, which builds them from the
    model's global receiver-order weight vector. Like the single-chip
    fused op, weights on this path are AD-constants.
    """
    from ragraph_tpu.ops.pallas_segment import gather_scale_segsum

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    w_all = edges.weights if weights is None else weights
    ws_all = edges.weights_send if weights_send is None else weights_send

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
    return list(fn(emb, edges.senders, edges.recv_indptr, w_all,
                   edges.recv_of_send, edges.send_indptr, ws_all))


def sharded_propagate_per_step(mesh: Mesh, emb: jax.Array,
                               edges: ShardedEdges, num_layers: int,
                               w_global: jax.Array,
                               axis_name: str = "idx", bf16: bool = True,
                               interpret: bool | None = None):
    """Model-facing entry: per-step global weights + node-count padding.

    ``w_global`` is the ``(E,)`` receiver-order weight vector the model
    computes each step (binorm × time fold × dropout mask —
    ``TemporalLightGCN._edge_weights``); it is mapped onto the shards
    with one scalar gather per edge order via ``edge_gid``/``edge_gid_send``
    (sharded indices, replicated operand → each device gathers only its
    own ``E/S`` slots). ``emb`` may have fewer rows than
    ``edges.num_nodes`` (the shard-divisible padded count); zero rows are
    appended and the outputs sliced back — padding rows have no edges, so
    they are inert. Returns ``[h0 .. hL]`` each ``(N, D)``.

    Weights are AD-constants here (true for every edge model: binorm
    degrees, time encodings and dropout masks never depend on params) —
    matching the single-chip fused path's contract.
    """
    if edges.edge_gid is None:
        raise ValueError("ShardedEdges lacks edge_gid maps — rebuild with "
                         "the current shard_edges_by_receiver")
    w_global = jax.lax.stop_gradient(w_global)
    w_sh = jnp.where(edges.valid, w_global[edges.edge_gid], 0.0)
    ws_sh = jnp.where(edges.valid_send, w_global[edges.edge_gid_send], 0.0)
    n = emb.shape[0]
    if n != edges.num_nodes:
        emb = jnp.pad(emb, ((0, edges.num_nodes - n), (0, 0)))
    layers = sharded_lightgcn_propagate(
        mesh, emb, edges, num_layers, axis_name=axis_name, bf16=bf16,
        interpret=interpret, weights=w_sh, weights_send=ws_sh)
    return [h[:n] for h in layers]
