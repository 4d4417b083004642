"""The edge (dynamic link-prediction / recommendation) model family.

Parity targets:
- ``RAGraph`` recommender (``RAGraph_edge/modules/RAGraph.py``): temporal
  LightGCN with phases pretrain / for_tune / vanilla / finetune, resource
  graph build (``:185-230``), batched cosine top-k retrieval + fusion
  (``:286-328``), SVD-initialized LoRA (``:122-160``), learned/random
  gating (``:166-183``), BPR + L2 loss (``:335-355``);
- ``GraphPro`` backbone (``modules/GraphPro.py``) = same temporal LightGCN
  without RAG/LoRA;
- ``LightGCN`` baseline (``modules/LightGCN.py``) = no time encoding, no
  gating.

TPU-native notes: edge dropout is a weight mask (static shapes); the
retrieval scores are one ``(N, R)`` MXU matmul + ``lax.top_k`` instead of
the reference's Python chunk loop (``:298-324``) — XLA tiles it; for very
large libraries the Pallas blocked kernel / sharded index take over
(``ragraph_tpu.ops.pallas_retrieval``, ``ragraph_tpu.parallel``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ragraph_tpu.data.edgelist import EdgeDataset
from ragraph_tpu.models.edge.base import (EdgeModelConfig, bpr_loss,
                                          edge_drop_mask, hash_edge_mask,
                                          lightgcn_propagate,
                                          reg_loss_emb,
                                          relative_time_encoding)
from ragraph_tpu.nn.gating import learned_gate, random_gate
from ragraph_tpu.nn.lora import LoRAFactors, apply_lora, svd_init
from ragraph_tpu.ops.pagerank import inverse_sample_prob_edges
from ragraph_tpu.ops.selection import rowwise_kth_largest
from ragraph_tpu.ops.topk import cosine_topk, topk_gather
from ragraph_tpu.rag.augmentation import augment_features

xavier = jax.nn.initializers.glorot_uniform()

# Per-dataset RAG knobs (modules/RAGraph.py:33-85). "default" covers
# synthetic/test datasets.
# _fuse_rag switches from the (chunk, k, E) index-gather retrieval to the
# k-th-score-threshold membership matmul when k * emb_size exceeds this
# (the koubei/taobao vanilla retrieve_num=100000 regime). Module-level so
# tests can monkeypatch it small and exercise the threshold path against
# the index path on toy libraries.
_BIG_K_ELEMS = 1 << 20

EDGE_DATASET_CONFIGS = {
    "amazon": dict(retrieve_weight=0.3,
                   vanilla=dict(rag_chunk=32768, retrieve_num=50,
                                num_augment_scale=0, inverse_frac=0.01),
                   finetune=dict(rag_chunk=4096, retrieve_num=10,
                                 noise_retrieve_num=1, num_augment_scale=0,
                                 num_inverse_sample=0)),
    "koubei": dict(retrieve_weight=0.3,
                   vanilla=dict(rag_chunk=512, retrieve_num=100000,
                                num_augment_scale=1, inverse_frac=0.01),
                   finetune=dict(rag_chunk=4096, retrieve_num=20,
                                 noise_retrieve_num=1, num_augment_scale=0,
                                 num_inverse_sample=0)),
    "taobao": dict(retrieve_weight=0.3,
                   vanilla=dict(rag_chunk=512, retrieve_num=100000,
                                num_augment_scale=1, inverse_frac=0.01),
                   finetune=dict(rag_chunk=4096, retrieve_num=20,
                                 noise_retrieve_num=1, num_augment_scale=0,
                                 num_inverse_sample=0)),
}


@dataclasses.dataclass
class EdgeGraphArrays:
    """Device copies of the bidirectional interaction graph.

    Registered as a JAX pytree (array fields traced, user/item counts
    static) so it can be passed *as a jit argument*: one compiled train
    step then serves any graph of the same shape instead of baking the
    edge arrays into the executable as multi-GB constants (the reference
    analog re-gathers per step, ``modules/RAGraph.py:232-240``).
    """

    senders: jax.Array
    receivers: jax.Array
    edge_norm: jax.Array
    edge_times: jax.Array
    num_users: int
    num_items: int
    recv_indptr: jax.Array | None = None  # CSR bounds (receiver-sorted)
    # sender-order auxiliaries (backward pass of the fused propagation:
    # d_emb becomes ONE row gather + a sorted reduce instead of a
    # scatter-add — see ops/pallas_segment.gather_scale_segsum)
    send_perm: jax.Array | None = None     # edge ids sorted by sender
    send_indptr: jax.Array | None = None   # CSR bounds in sender order
    recv_of_send: jax.Array | None = None  # receivers[send_perm]
    edge_norm_send: jax.Array | None = None
    # static per-destination time softmax (``time_mode='static'``),
    # precomputed exactly in f64 on the host; both edge orders
    time_norm: jax.Array | None = None
    time_norm_send: jax.Array | None = None
    # receiver-range-sharded auxiliaries for multi-chip shard_map
    # propagation (parallel/edge_sharded.ShardedEdges, itself a pytree);
    # attach with :meth:`with_sharding`
    sharded: Any = None

    @classmethod
    def from_dataset(cls, ds: EdgeDataset) -> "EdgeGraphArrays":
        indptr = (jnp.asarray(ds.recv_indptr)
                  if getattr(ds, "recv_indptr", None) is not None else None)
        send = np.asarray(ds.senders)
        recv = np.asarray(ds.receivers)
        norm = np.asarray(ds.edge_norm)
        n_nodes = ds.num_users + ds.num_items
        perm = np.argsort(send, kind="stable").astype(np.int32)
        sip = np.zeros(n_nodes + 1, np.int32)
        sip[1:] = np.cumsum(np.bincount(send, minlength=n_nodes))

        # static time softmax (RAGraph.py:250-263 semantics on the full
        # graph), exact in f64; zero-weight padding edges are excluded
        t = np.asarray(ds.edge_times_bi, np.float64)
        realm = norm > 0
        tr = t[realm] if realm.any() else t
        tmin = tr.min() if tr.size else 0.0
        span = max((tr.max() - tmin), 1e-12) if tr.size else 1.0
        e = np.where(realm, np.exp((t - tmin) / span), 0.0)
        denom = np.bincount(recv, weights=e, minlength=n_nodes)
        tn = np.where(realm, e / np.maximum(denom[recv], 1e-300),
                      0.0).astype(np.float32)

        return cls(senders=jnp.asarray(ds.senders),
                   receivers=jnp.asarray(ds.receivers),
                   edge_norm=jnp.asarray(norm),
                   edge_times=jnp.asarray(ds.edge_times_bi),
                   num_users=ds.num_users, num_items=ds.num_items,
                   recv_indptr=indptr,
                   send_perm=jnp.asarray(perm),
                   send_indptr=jnp.asarray(sip),
                   recv_of_send=jnp.asarray(recv[perm].astype(np.int32)),
                   edge_norm_send=jnp.asarray(norm[perm]),
                   time_norm=jnp.asarray(tn),
                   time_norm_send=jnp.asarray(tn[perm]))

    @property
    def num_nodes(self):
        return self.num_users + self.num_items

    @property
    def num_edges(self):
        return int(self.senders.shape[0])

    def with_sharding(self, n_shards: int) -> "EdgeGraphArrays":
        """Attach receiver-range-sharded edge auxiliaries for the
        multi-chip shard_map propagation (``parallel/edge_sharded.py``).

        The node count is padded up to a multiple of ``n_shards`` inside
        the sharded structure (``sharded.num_nodes``); the forward pads
        the table with zero rows and slices them back — padding rows
        carry no edges, so they are inert. Edges must be receiver-sorted
        (they are, everywhere in this family).
        """
        from ragraph_tpu.parallel.edge_sharded import shard_edges_by_receiver
        n_pad = -(-self.num_nodes // n_shards) * n_shards
        sh = shard_edges_by_receiver(
            np.asarray(self.senders), np.asarray(self.receivers),
            np.asarray(self.edge_norm), n_pad, n_shards)
        return dataclasses.replace(self, sharded=sh)


jax.tree_util.register_dataclass(
    EdgeGraphArrays,
    data_fields=["senders", "receivers", "edge_norm", "edge_times",
                 "recv_indptr", "send_perm", "send_indptr", "recv_of_send",
                 "edge_norm_send", "time_norm", "time_norm_send", "sharded"],
    meta_fields=["num_users", "num_items"])


class TemporalLightGCN:
    """Shared engine for LightGCN / GraphPro / RAGraph-edge.

    Flags: ``use_time`` (GraphPro/RAGraph), ``use_rag`` + ``use_lora``
    (RAGraph only). ``phase`` follows the reference lifecycle.
    """

    use_time: bool = True
    use_rag: bool = False

    def __init__(self, cfg: EdgeModelConfig, graph: EdgeGraphArrays,
                 phase: str = "pretrain", mesh=None):
        self.cfg = cfg
        self.graph = graph
        self.phase = phase
        self.mesh = mesh            # multi-chip: shard_map propagation
        self.resource_keys = None   # (R, E) buffers, not parameters
        self.resource_values = None

    def _segsum_impl(self, graph: EdgeGraphArrays | None = None) -> str:
        """Pick the propagation backend.

        ``"auto"`` (default) selects, in order: the fused custom-VJP
        propagation (bf16 gathers + sorted reduce in BOTH directions —
        measured ~3x per layer at 2M edges) when the sender-order
        auxiliaries exist; the Pallas sorted prefix-sum forward; XLA
        scatter-add. Kernel paths are TPU-gated (Mosaic) unless forced.
        """
        g = self.graph if graph is None else graph
        import jax as _jax
        want = self.cfg.segsum_impl
        on_tpu = _jax.default_backend() == "tpu"
        have_sorted = g.recv_indptr is not None
        have_fused = (have_sorted and g.send_indptr is not None
                      and g.recv_of_send is not None
                      and g.edge_norm_send is not None)
        if want == "fused" and have_fused:
            return "fused"
        if want == "auto" and on_tpu and have_fused:
            return "fused"
        if want in ("sorted", "fused") and on_tpu and have_sorted:
            return "sorted"
        if want == "auto" and on_tpu and have_sorted:
            return "sorted"
        return "scatter"

    def _bf16(self) -> bool:
        import jax as _jax
        d = self.cfg.propagate_dtype
        return d == "bf16" or (d == "auto"
                               and _jax.default_backend() == "tpu")

    def _edge_weights(self, g, edge_mask, edge_mask_send,
                      time_scale: float = 1.0, max_time_step=None):
        """Per-edge propagation weights in receiver order (+ sender order
        when the fused path applies). Returns ``(weights, w_send, impl)``.

        Static time mode folds the precomputed per-destination time
        softmax in (inverted-dropout scaled by ``time_scale``); renorm
        mode recomputes it over surviving edges exactly as the reference
        does (``modules/RAGraph.py:250-263``), which forces the non-fused
        backend (the softmax only exists in receiver order).
        """
        cfg = self.cfg
        impl = self._segsum_impl(g)
        static_time = (cfg.time_mode == "static"
                       and g.time_norm is not None
                       and max_time_step is None)
        downgrade = ("sorted" if jax.default_backend() == "tpu"
                     and g.recv_indptr is not None else "scatter")
        if impl == "fused" and (edge_mask is not None
                                and edge_mask_send is None):
            impl = downgrade         # no sender-order mask available
        if impl == "fused" and self.use_time and not static_time:
            impl = downgrade         # renorm time softmax is recv-only

        weights = g.edge_norm
        w_send = g.edge_norm_send if impl == "fused" else None
        if self.use_time and static_time:
            weights = weights * 0.5 + g.time_norm * (0.5 * time_scale)
            if impl == "fused":
                w_send = w_send * 0.5 + g.time_norm_send * (0.5 * time_scale)
            if edge_mask is not None:
                weights = jnp.where(edge_mask, weights, 0.0)
                if impl == "fused":
                    w_send = jnp.where(edge_mask_send, w_send, 0.0)
        else:
            if edge_mask is not None:
                weights = jnp.where(edge_mask, weights, 0.0)
                if impl == "fused":
                    w_send = jnp.where(edge_mask_send, w_send, 0.0)
            if self.use_time:
                # zero-weight padding edges must not receive softmax mass
                pad_valid = g.edge_norm > 0
                tmask = (pad_valid if edge_mask is None
                         else pad_valid & edge_mask)
                tn = relative_time_encoding(
                    g.edge_times, g.receivers, g.num_nodes,
                    edge_mask=tmask, max_step=max_time_step)
                weights = weights * 0.5 + tn * 0.5
        return weights, w_send, impl

    def _drop_masks(self, key, g, keep_rate: float):
        """Edge-keep mask in receiver order (+ sender order when the
        sender auxiliaries exist, enabling the fused propagation)."""
        if g.send_perm is not None:
            return (hash_edge_mask(key, jnp.arange(g.num_edges), keep_rate),
                    hash_edge_mask(key, g.send_perm, keep_rate))
        return edge_drop_mask(key, g.num_edges, keep_rate), None

    def _prop_layer(self, g, h, weights, w_send, impl):
        """One propagation layer under the chosen backend (the per-layer
        building block for the plugin/dynamic loops)."""
        if impl == "fused":
            from ragraph_tpu.ops.pallas_segment import gather_scale_segsum
            return gather_scale_segsum(
                h, weights, w_send, g.senders, g.recv_indptr,
                g.recv_of_send, g.send_indptr, bf16=self._bf16(),
                interpret=jax.default_backend() == "cpu")
        rows = jax.lax.optimization_barrier(h[g.senders])  # keep the
        msgs = rows * weights[:, None]                     # gather pure
        if impl == "sorted":
            from ragraph_tpu.ops.pallas_segment import sorted_segment_sum_grad
            return sorted_segment_sum_grad(
                msgs, g.recv_indptr, g.receivers,
                interpret=jax.default_backend() == "cpu")
        return jax.ops.segment_sum(msgs, g.receivers,
                                   num_segments=g.num_nodes)

    def _use_sharded(self, g) -> bool:
        """Multi-chip propagation applies when a mesh with a >1 ``idx``
        axis is set and the graph carries sharded auxiliaries."""
        return (self.mesh is not None
                and getattr(g, "sharded", None) is not None
                and "idx" in self.mesh.axis_names
                and self.mesh.shape["idx"] > 1)

    def _propagate_layers(self, g, all_emb, weights, w_send, impl):
        """The full layer stack under the chosen backend.

        Routes to the receiver-range shard_map path
        (``parallel/edge_sharded.sharded_propagate_per_step``) when
        :meth:`_use_sharded` — GSPMD cannot partition the fused
        custom-VJP Pallas kernel, so multi-chip propagation must be
        explicit. The per-step receiver-order ``weights`` carry the
        dropout/time folds onto the shards; ``w_send`` is derived per
        shard from the same vector (not used on that path).
        """
        if self._use_sharded(g):
            from ragraph_tpu.parallel.edge_sharded import (
                sharded_propagate_per_step)
            return sharded_propagate_per_step(
                self.mesh, all_emb, g.sharded, self.cfg.num_layers,
                weights, bf16=self._bf16())
        return lightgcn_propagate(all_emb, g.senders, g.receivers, weights,
                                  g.num_nodes, self.cfg.num_layers,
                                  recv_indptr=g.recv_indptr, impl=impl,
                                  weights_send=w_send,
                                  recv_of_send=g.recv_of_send,
                                  send_indptr=g.send_indptr,
                                  bf16=self._bf16(),
                                  interpret=jax.default_backend() == "cpu")

    # -- params ------------------------------------------------------------

    def init_params(self, key: jax.Array,
                    pretrained_tables: tuple | None = None) -> dict:
        g, cfg = self.graph, self.cfg
        k_u, k_i, k_gw, k_gb = jax.random.split(key, 4)
        params: dict[str, Any] = {}
        if self.phase in ("pretrain", "for_tune") or pretrained_tables is None:
            params["user_embedding"] = xavier(k_u, (g.num_users, cfg.emb_size))
            params["item_embedding"] = xavier(k_i, (g.num_items, cfg.emb_size))
        else:
            u, it = pretrained_tables
            params["user_embedding"] = u
            params["item_embedding"] = it
        if self.phase == "finetune":
            params["gating_weight"] = xavier(k_gw, (cfg.emb_size, cfg.emb_size))
            params["gating_bias"] = xavier(k_gb, (1, cfg.emb_size))
            if self.use_rag and cfg.use_lora:
                params["user_lora"] = svd_init(params["user_embedding"],
                                               cfg.lora_rank,
                                               cfg.lora_init_scale)
                params["item_lora"] = svd_init(params["item_embedding"],
                                               cfg.lora_rank,
                                               cfg.lora_init_scale)
        return params

    # -- forward -----------------------------------------------------------

    def _effective_tables(self, params, key, training: bool):
        """Base tables + LoRA delta (``modules/RAGraph.py:269-274``)."""
        u, it = params["user_embedding"], params["item_embedding"]
        if self.phase == "finetune" and self.use_rag and self.cfg.use_lora:
            ku = ki = None
            if training and key is not None and self.cfg.emb_dropout > 0:
                ku, ki = jax.random.split(jax.random.fold_in(key, 1))
            u_f = LoRAFactors(*params["user_lora"])
            i_f = LoRAFactors(*params["item_lora"])
            if not self.cfg.lora_train_factors:
                # reference-driver dynamics: the factors are plain
                # tensors the torch optimizer never updates (see
                # EdgeModelConfig.lora_train_factors) — the delta is a
                # constant additive bias, so cut its gradient here and
                # Adam's zero-grad no-op leaves the leaves untouched.
                u_f = jax.tree.map(jax.lax.stop_gradient, u_f)
                i_f = jax.tree.map(jax.lax.stop_gradient, i_f)
            u = apply_lora(u, u_f, self.cfg.emb_dropout, ku)
            it = apply_lora(it, i_f, self.cfg.emb_dropout, ki)
        return u, it

    def _gate(self, params, all_emb, key, training: bool):
        if self.phase == "finetune":
            gk = None
            if training and key is not None and self.cfg.emb_dropout > 0:
                gk = jax.random.fold_in(key, 2)
            return learned_gate(all_emb, params["gating_weight"],
                                params["gating_bias"],
                                self.cfg.emb_dropout, gk)
        if self.phase == "for_tune":
            gk = (jax.random.fold_in(key, 3) if key is not None
                  else jax.random.key(0))
            return random_gate(all_emb, gk)
        return all_emb

    def forward(self, params, *, key=None, training: bool = False,
                edge_mask=None, edge_mask_send=None, time_scale: float = 1.0,
                max_time_step=None, graph=None, resources=None):
        """Returns ``(user_emb, item_emb)``.

        ``graph`` / ``resources`` override the instance buffers so jitted
        callers can pass them as *arguments* (traced pytrees) instead of
        closure-captured constants — required at 100M-edge scale where
        baked-in constants stall compilation and duplicate HBM.

        ``edge_mask_send`` is the same keep mask in sender order (see
        ``hash_edge_mask``); together with ``time_mode='static'`` it
        enables the fused propagation. ``time_scale`` rescales the static
        time softmax under dropout (inverted-dropout, 1/keep_rate).
        """
        g = self.graph if graph is None else graph
        cfg = self.cfg
        weights, w_send, impl = self._edge_weights(
            g, edge_mask, edge_mask_send, time_scale=time_scale,
            max_time_step=max_time_step)

        u, it = self._effective_tables(params, key, training)
        all_emb = jnp.concatenate([u, it], axis=0)
        all_emb = self._gate(params, all_emb, key, training)

        layers = self._propagate_layers(g, all_emb, weights, w_send, impl)
        res_emb = sum(layers)

        res_src = (resources if resources is not None
                   else (self.resource_keys, self.resource_values))
        if self.use_rag and self.phase in ("vanilla", "finetune") \
                and res_src[0] is not None:
            res_emb = self._fuse_rag(layers[0], res_emb, key, training,
                                     resources=res_src)

        return res_emb[: g.num_users], res_emb[g.num_users:]

    def _fuse_rag(self, query_emb, res_emb, key, training: bool,
                  resources=None):
        """Cosine top-k over the resource library + 50/50-style fusion
        (``modules/RAGraph.py:286-328``).

        Queries are chunked with ``lax.map`` at ``cfg.batch_size`` (the
        reference's chunk knob, ``:291-298``) so the ``(N, R)`` score
        matrix never materializes at full size — at amazon scale that
        would be ~230 GB.
        """
        cfg = self.cfg
        res_keys, res_values = (resources if resources is not None
                                else (self.resource_keys,
                                      self.resource_values))
        add_noise = cfg.use_noise and training and self.phase == "finetune"
        # noise mode widens the retrieval: the reference fetches
        # top-(retrieve_num + noise_retrieve_num) and THEN appends
        # noise_retrieve_num random rows (modules/RAGraph.py:310), so the
        # mean is over (k + nk) + nk rows.
        k = cfg.retrieve_num + (cfg.noise_retrieve_num if add_noise else 0)
        k = min(k, res_keys.shape[0])
        qn, e = query_emb.shape
        chunk = min(cfg.rag_chunk or cfg.batch_size, qn)

        # TPU memory shape: the mean over retrieved values is computed
        # INSIDE the query-chunk loop, so nothing (N, k, ·)-shaped ever
        # materializes. Two per-chunk strategies:
        # - small k: top-k indices -> (chunk, k, E) gather -> mean;
        # - huge k (koubei/taobao vanilla retrieve_num=100000,
        #   EDGE_DATASET_CONFIGS): selecting by the k-th score THRESHOLD
        #   and mean-reducing via a (chunk, R) 0/1-matrix @ values MXU
        #   matmul — the (chunk, k) index tensor alone would be 200 MB
        #   and its gather 13 GB; the membership matmul is ~0.5 GB and
        #   rides the MXU. Equal to the index path modulo exact score
        #   ties at the k-th boundary (arbitrary tiebreak either way).
        from ragraph_tpu.ops.similarity import l2_normalize
        keys_n = l2_normalize(res_keys)
        big_k = k * e > _BIG_K_ELEMS
        sel_bf16 = big_k and cfg.selection_dtype == "bf16"
        if sel_bf16:
            # bf16 selection tier: score the chunk in bf16 and radix-
            # search 16-bit keys (6 half-width passes vs 11 full-width,
            # ~3x — ops/selection.py). Cast the table ONCE outside the
            # lax.map body (the quantize-once rule).
            keys_n = keys_n.astype(jnp.bfloat16)
        if cfg.retrieve_dtype == "int8" and not big_k:
            # quantize the table ONCE, outside the per-chunk lax.map body
            # — in-loop quantization is a full HBM pass per chunk unless
            # XLA happens to hoist it (the "quantize-once" rule,
            # ops/topk.quantize_keys_i8)
            from ragraph_tpu.ops.topk import quantize_keys_i8
            keys_q = quantize_keys_i8(keys_n, normalized=True)
        else:
            keys_q = keys_n

        # multi-chip: route the huge-k branch through the idx-sharded
        # fusion (psum'd radix threshold, bitwise-equal; the (chunk, R)
        # scores exist only as per-device (chunk, R/D) shards) whenever a
        # >1 idx mesh is set and the library row count divides the axis —
        # the sharded resource build produces divisible capacities.
        shard_fuse = (big_k and self.mesh is not None
                      and "idx" in self.mesh.axis_names
                      and self.mesh.shape["idx"] > 1
                      and res_keys.shape[0] % self.mesh.shape["idx"] == 0)

        def chunk_mean(qc):
            """(chunk, E) queries -> (mean of top-k values, count)."""
            if big_k:
                if shard_fuse:
                    from ragraph_tpu.parallel.sharded_selection import (
                        sharded_huge_k_fuse)
                    return sharded_huge_k_fuse(self.mesh, qc, keys_n,
                                               res_values, k)
                scores = jnp.dot(l2_normalize(qc).astype(keys_n.dtype),
                                 keys_n.T,
                                 preferred_element_type=(
                                     jnp.bfloat16 if sel_bf16
                                     else jnp.float32))
                # exact k-th value by radix-8 bitwise search — 23.9x the
                # lax.top_k near-full sort at k=100k on a (256, 442k)
                # chunk (10.7 vs 256.3 ms, v5e), same value under ties;
                # bf16 scores take the native 16-bit search (~3x again)
                kth = rowwise_kth_largest(scores, k)
                member = (scores >= kth)                     # (chunk, R)
                count = member.sum(axis=1, keepdims=True)
                s = jnp.dot(member.astype(res_values.dtype), res_values,
                            preferred_element_type=jnp.float32)
                return s / jnp.maximum(count, 1), count[:, 0]
            _, idx = cosine_topk(qc, keys_q, k, keys_normalized=True,
                                 score_dtype=self.cfg.retrieve_dtype)
            vals = topk_gather(res_values, idx)              # (chunk, k, E)
            return vals.mean(axis=1), jnp.full((qc.shape[0],), k, jnp.int32)

        if qn > chunk:
            pad = (-qn) % chunk
            q_pad = jnp.pad(query_emb, ((0, pad), (0, 0)))
            chunks = q_pad.reshape(-1, chunk, e)
            means, counts = jax.lax.map(chunk_mean, chunks)
            rag_emb = means.reshape(-1, e)[:qn]
            counts = counts.reshape(-1)[:qn]
        else:
            rag_emb, counts = chunk_mean(query_emb)

        if add_noise:
            # reference appends noise_retrieve_num random resource rows to
            # every retrieval set (finetune_noise.py protocol); the mean
            # over [top-k, noise] decomposes as a count-weighted blend
            nk_key = jax.random.fold_in(key, 7)
            nk = cfg.noise_retrieve_num
            noise_idx = jax.random.randint(nk_key, (qn, nk), 0,
                                           res_values.shape[0])
            noise_sum = topk_gather(res_values, noise_idx).sum(axis=1)
            c = counts[:, None].astype(rag_emb.dtype)
            rag_emb = (rag_emb * c + noise_sum) / (c + nk)
        return (1.0 - cfg.retrieve_weight) * res_emb \
            + cfg.retrieve_weight * rag_emb

    # -- resource graph (library) ------------------------------------------

    def make_resource_graph(self, pretrained_user_emb, pretrained_item_emb,
                            key: jax.Array, graph=None):
        """Build the retrieval library from pretrained embeddings
        (``modules/RAGraph.py:185-230``): keys = last propagation layer,
        values = sum of even ('dual-hop') layers; optional inverse sampling
        + feature-space augmentation. Sets the instance buffers and returns
        ``(keys, values)`` for argument-passing callers."""
        g = self.graph if graph is None else graph
        cfg = self.cfg
        all_emb = jnp.concatenate([pretrained_user_emb, pretrained_item_emb],
                                  axis=0)
        layers = self._propagate_layers(g, all_emb, g.edge_norm, None,
                                        self._segsum_impl(g))
        keys_base = layers[-1]
        values_base = sum(layers[0::2])

        sample_prob = inverse_sample_prob_edges(
            g.senders, g.receivers, g.edge_norm, g.num_nodes)

        all_keys, all_values = [], []
        for i in range(1 + cfg.num_augment_scale):
            k_i = jax.random.fold_in(key, i)
            if i > 0:
                kf, kv = jax.random.split(k_i)
                aug_keys = augment_features(kf, keys_base, sample_prob)
                aug_values = augment_features(kv, values_base, sample_prob)
            else:
                aug_keys, aug_values = keys_base, values_base
            if cfg.num_inverse_sample > 0:
                idx = jax.random.choice(jax.random.fold_in(k_i, 99),
                                        g.num_nodes,
                                        shape=(cfg.num_inverse_sample,),
                                        replace=True, p=sample_prob)
                aug_keys = aug_keys[idx]
                aug_values = aug_values[idx]
            all_keys.append(aug_keys)
            all_values.append(aug_values)

        self.resource_keys = jnp.concatenate(all_keys, axis=0)
        self.resource_values = jnp.concatenate(all_values, axis=0)
        return self.resource_keys, self.resource_values

    # -- loss / eval -------------------------------------------------------

    def cal_loss(self, params, batch, key, graph=None, resources=None):
        """BPR + weight-decay L2 (``modules/RAGraph.py:335-355``)."""
        g = self.graph if graph is None else graph
        users, pos_items, neg_items = batch
        k_drop, k_fwd = jax.random.split(key)
        keep = 1.0 - self.cfg.edge_dropout
        mask, mask_send = self._drop_masks(k_drop, g, keep)
        user_emb, item_emb = self.forward(params, key=k_fwd, training=True,
                                          edge_mask=mask,
                                          edge_mask_send=mask_send,
                                          time_scale=1.0 / keep,
                                          graph=g,
                                          resources=resources)
        rec = bpr_loss(user_emb[users], item_emb[pos_items],
                       item_emb[neg_items])
        u_t, i_t = self._effective_tables(params, None, False)
        reg = self.cfg.weight_decay * reg_loss_emb(u_t, i_t, users,
                                                   pos_items, neg_items)
        return rec + reg, {"rec_loss": rec, "reg_loss": reg}

    def generate(self, params, key=None, max_time_step=None, graph=None,
                 resources=None):
        """Full-graph embeddings, no dropout (``:357-359``)."""
        return self.forward(params, key=key, training=False,
                            max_time_step=max_time_step, graph=graph,
                            resources=resources)

    @staticmethod
    def rating(user_emb, item_emb):
        return jnp.dot(user_emb, item_emb.T,
                       preferred_element_type=jnp.float32)

    @staticmethod
    def recommend_from(user_emb: jax.Array, item_emb: jax.Array,
                       user_ids: jax.Array, k: int = 20,
                       hist_rows: jax.Array | None = None,
                       hist_cols: jax.Array | None = None,
                       hist_pad: int | None = None,
                       recall_target: float = 0.99):
        """Serving hot path from PRECOMPUTED embeddings: score + history
        mask + top-k. In production the full-graph ``generate`` runs once
        per model refresh (it depends only on params + graph), while this
        runs per request — see ``benchmarks/bench_serving.py`` for the
        measured request latencies.

        ``hist_rows/hist_cols`` index (batch-row, item) pairs to exclude
        (the user's seen items; out-of-bounds columns are ignored). Uses
        the TPU PartialReduce top-k above 32k items.

        ``hist_pad``: with the default ``None``, history is masked by a
        scatter into the full score matrix — but the scatter between the
        matmul and the top-k forces the ``(B, I)`` f32 scores to
        materialize in HBM (8.5 ms at B=4096 over 131k items, v5e). A
        positive ``hist_pad`` switches to the FUSED path: top-(k +
        hist_pad) candidates straight out of the matmul epilogue (no
        scatter in between), then history filtered among the candidates
        and the final k re-extracted. The candidate op's cost rises
        steeply with ``recall_target`` at large k (k=84: 0.65 ms at 0.9
        vs 30.8 ms at 0.99, same shape) — measured end-to-end,
        ``hist_pad=64, recall_target=0.95`` matches the scatter path's
        recall@20 vs the exact masked sort (0.9954 both) at 2.5x lower
        request latency — 3.35 vs 8.49 ms at B=4096
        (benchmarks/bench_serving.py). On the exact (<32k items)
        branch the result is identical to the scatter path whenever each
        row has at most ``hist_pad`` history items inside its
        top-(k + hist_pad).
        """
        scores = jnp.dot(user_emb[user_ids], item_emb.T,
                         preferred_element_type=jnp.float32)
        approx = item_emb.shape[0] >= 32_768

        def topk(x, kk):
            if approx:
                return jax.lax.approx_max_k(x, kk,
                                            recall_target=recall_target)
            return jax.lax.top_k(x, kk)

        if hist_rows is None:
            return topk(scores, k)
        if not hist_pad:
            scores = scores.at[hist_rows, hist_cols].set(-1e8, mode="drop")
            return topk(scores, k)
        b = scores.shape[0]
        s, idx = topk(scores, k + hist_pad)        # fused, unmasked
        # mark candidates that are history items: O(H * (k+pad)) compares
        rows = jnp.clip(hist_rows, 0, b - 1)
        seen = (idx[rows] == hist_cols[:, None]) & (hist_rows[:, None] < b)
        bad = jnp.zeros(idx.shape, bool).at[rows].max(seen)
        s = jnp.where(bad, -1e8, s)
        s2, pos = jax.lax.top_k(s, k)              # (B, k+pad) — cheap
        return s2, jnp.take_along_axis(idx, pos, axis=1)

    def recommend(self, params, user_ids: jax.Array, k: int = 20,
                  hist_rows: jax.Array | None = None,
                  hist_cols: jax.Array | None = None, key=None):
        """One-shot serving path: full ``generate`` + :meth:`recommend_from`."""
        user_emb, item_emb = self.generate(params, key=key)
        return self.recommend_from(user_emb, item_emb, user_ids, k=k,
                                   hist_rows=hist_rows, hist_cols=hist_cols)


class LightGCNEdge(TemporalLightGCN):
    """Plain LightGCN (no time encoding, no gate, no RAG)."""

    use_time = False
    use_rag = False

    def _gate(self, params, all_emb, key, training):
        return all_emb


class GraphPro(TemporalLightGCN):
    """Temporal LightGCN with gating (the pretrain backbone)."""

    use_time = True
    use_rag = False

    def init_params(self, key, pretrained_tables=None):
        params = super().init_params(key, pretrained_tables)
        # GraphPro fine-tune keeps gating but never LoRA
        params.pop("user_lora", None)
        params.pop("item_lora", None)
        return params


class RAGraphEdge(TemporalLightGCN):
    """The RAG recommender."""

    use_time = True
    use_rag = True


def edge_config_for(dataset_name: str, phase: str,
                    num_nodes: int | None = None,
                    **overrides) -> EdgeModelConfig:
    """Materialize the per-dataset knob table into a typed config."""
    base = EDGE_DATASET_CONFIGS.get(dataset_name)
    kwargs: dict[str, Any] = {}
    if base is not None:
        kwargs["retrieve_weight"] = base["retrieve_weight"]
        sub = base["vanilla"] if phase == "vanilla" else base["finetune"]
        for k, v in sub.items():
            if k == "inverse_frac":
                if num_nodes is not None:
                    kwargs["num_inverse_sample"] = round(v * num_nodes)
            else:
                kwargs[k] = v
    kwargs.update(overrides)
    return EdgeModelConfig(**kwargs)
