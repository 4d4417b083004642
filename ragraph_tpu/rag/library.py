"""The toy-graph vector library (key/value/label/position store).

Reference: ``ToyGraphBase`` in all five packages —
``RAGraph_node/ragraph_utils/ToyGraphBase.py`` (node-level entries,
top-k + random-row noise), ``RAGraph_graph/ragraph_utils/ToyGraphBase.py``
(graph-level mean-pooled entries, one-hot graph labels, additive Gaussian
noise), ``RAGraph_node_fewshot/ragraph_utils/ToyGraphBase.py`` (live
structure-similarity path with position codes).

TPU-native redesign (vs the reference's ``torch.cat``-grown tensors and
batch-size-1 Python build loop):

- **Preallocated, fixed-capacity store** with a fill counter. Appends are
  compacting masked scatters — O(rows) instead of the reference's O(R²)
  total re-copy; shapes never change, so every consumer jits once.
  Row ``capacity`` is a write dump for invalid rows.
- **Batched, vmapped build**: graphs are padded to a common bucket and the
  whole per-graph pipeline (inverse-sampling PageRank, augmentation,
  frozen-encoder inference, k-hop value propagation, position codes) runs
  as ONE jitted ``vmap`` over the graph batch — hundreds of library graphs
  per device step instead of one.
- **Retrieval** is a single MXU matmul + ``lax.top_k`` with fill masking
  (see :mod:`ragraph_tpu.ops.topk`); the ICI-sharded variant lives in
  :mod:`ragraph_tpu.parallel.sharded_index`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ragraph_tpu.core.graph import _pytree_dataclass
from ragraph_tpu.ops.pagerank import inverse_sample_prob_dense
from ragraph_tpu.ops.propagation import aggregate_k_hop_dense
from ragraph_tpu.ops.shortest_path import position_aware_codes
from ragraph_tpu.ops.similarity import l2_normalize
from ragraph_tpu.ops.topk import cosine_topk, topk_gather
from ragraph_tpu.rag.augmentation import augment_adj, augment_features


@dataclasses.dataclass(frozen=True)
class LibraryConfig:
    """Knobs of the library build + query phases.

    Defaults mirror ``RAGraph_node/ragraph_utils/ToyGraphBase.py:18-29``;
    the graph variant uses ``level='graph'``, ``num_inverse_sample=0``,
    ``num_augment_scale=0``, ``noise_mode='gaussian'``
    (``RAGraph_graph/ragraph_utils/ToyGraphBase.py:21-28``); the fewshot
    variant enables ``structure_weight=0.001``
    (``RAGraph_node_fewshot/ragraph_utils/ToyGraphBase.py:28-29``).
    """

    level: str = "node"               # "node" | "graph"
    num_inverse_sample: int = 10      # 0 disables inverse sampling
    num_augment_scale: int = 3        # augmented copies per graph
    retrieve_num: int = 4             # num_class + 1 in the node variant
    noise_retrieve_num: int = 1
    noise_mode: str = "rows"          # "rows" | "gaussian"
    noise_std: float = 0.01
    toy_graph_hop: int = 2            # query_graph_hop - 1
    use_positions: bool = True
    num_anchors: int = 10
    dis_q: int = 10
    structure_weight: float = 0.0
    semantic_weight: float = 0.999
    # int8 MXU scoring tier (``ops.topk.cosine_topk(score_dtype=...)``):
    # measured recall cost 0.9254 recall@10 raw / 0.9875 with
    # rescore_pad=22 at R=262k — opt-in, and inert on the
    # structure-weighted fewshot path (which scores outside cosine_topk).
    # NOTE on speed: retrieve() passes the float store, so the table is
    # quantized once per retrieve CALL (one extra HBM pass over the live
    # keys — small at library scale, and rescore needs the float rows
    # anyway). The full 2.2x is for serving loops that pre-quantize via
    # ``ops.topk.quantize_keys_i8`` and call cosine_topk directly.
    retrieve_dtype: str = "input"     # "input" | "int8"
    retrieve_rescore_pad: int = 0


@_pytree_dataclass(meta_fields=("capacity",))
class ToyGraphLibrary:
    """Fixed-capacity key/value/label/position store (+1 dump row)."""

    keys: jax.Array        # (capacity+1, E)
    values: jax.Array      # (capacity+1, E)
    labels: jax.Array      # (capacity+1, C)
    positions: jax.Array   # (capacity+1, A)
    fill: jax.Array        # scalar int32
    capacity: int

    @property
    def valid_mask(self) -> jax.Array:
        return jnp.arange(self.capacity) < self.fill

    def live(self):
        """The live (capacity-trimmed) views used by retrieval."""
        return (self.keys[: self.capacity], self.values[: self.capacity],
                self.labels[: self.capacity], self.positions[: self.capacity])


def library_init(capacity: int, emb_size: int, num_classes: int,
                 num_anchors: int = 10) -> ToyGraphLibrary:
    return ToyGraphLibrary(
        keys=jnp.zeros((capacity + 1, emb_size)),
        values=jnp.zeros((capacity + 1, emb_size)),
        labels=jnp.zeros((capacity + 1, num_classes)),
        positions=jnp.zeros((capacity + 1, num_anchors)),
        fill=jnp.zeros((), jnp.int32),
        capacity=capacity,
    )


def library_reset(lib: ToyGraphLibrary) -> ToyGraphLibrary:
    """Empty the store (the reference rebuilds the library from the val
    split before testing, ``RAGraph_node/finetune-rag.py:97``)."""
    return dataclasses.replace(lib, fill=jnp.zeros((), jnp.int32))


@jax.jit
def library_append(lib: ToyGraphLibrary, keys: jax.Array, values: jax.Array,
                   labels: jax.Array, positions: jax.Array,
                   valid: jax.Array) -> ToyGraphLibrary:
    """Compacting append: valid rows pack densely after ``fill``.

    Invalid rows and overflow beyond capacity land in the dump row.
    """
    valid_i = valid.astype(jnp.int32)
    pos = lib.fill + jnp.cumsum(valid_i) - valid_i
    pos = jnp.where(valid & (pos < lib.capacity), pos, lib.capacity)
    new_fill = jnp.minimum(lib.fill + valid_i.sum(),
                           jnp.asarray(lib.capacity, jnp.int32))
    return dataclasses.replace(
        lib,
        keys=lib.keys.at[pos].set(keys),
        values=lib.values.at[pos].set(values),
        labels=lib.labels.at[pos].set(labels),
        positions=lib.positions.at[pos].set(positions),
        fill=new_fill,
    )


# ---------------------------------------------------------------------------
# Build phase
# ---------------------------------------------------------------------------

def _entries_one_copy(encoder_fn: Callable, features, adj, clean_adj, labels,
                      node_mask, graph_onehot, cfg: LibraryConfig, key):
    """Library entries from one (possibly augmented) copy of one graph.

    Parity with ``ToyGraphBase._build_toy_graph_base``
    (``RAGraph_node/ragraph_utils/ToyGraphBase.py:91-119``); note the
    reference subsets the *clean* adjacency for sampled nodes (``:100``)
    even when keys come from the augmented encoder pass.
    """
    n_pad = features.shape[0]
    k_prob, k_sample, k_pos = jax.random.split(key, 3)
    embeddings = encoder_fn(features, adj)
    graph_valid = node_mask.any()  # batch-padding graphs yield no entries

    if cfg.num_inverse_sample > 0:
        sample_prob = inverse_sample_prob_dense(adj, node_mask)
        # empty (padding) graph: fall back to uniform so choice() is
        # well-defined; its rows are invalidated below anyway.
        p_safe = jnp.where(sample_prob.sum() > 0, sample_prob,
                           jnp.full((n_pad,), 1.0 / n_pad))
        idx = jax.random.choice(k_sample, n_pad,
                                shape=(cfg.num_inverse_sample,),
                                replace=True, p=p_safe)
        sample_adj = clean_adj[idx][:, idx]
        keys_ = embeddings[idx]
        labels_ = labels[idx]
        valid = jnp.full((cfg.num_inverse_sample,), True) & graph_valid
        sample_mask = valid
    else:
        sample_adj = adj
        keys_ = embeddings
        labels_ = labels
        valid = node_mask
        sample_mask = node_mask

    keys_ = l2_normalize(keys_)
    values_ = aggregate_k_hop_dense(sample_adj, keys_, cfg.toy_graph_hop)
    if cfg.use_positions:
        positions_ = position_aware_codes(
            sample_adj, k_pos, sample_mask,
            num_anchors=cfg.num_anchors, dis_q=cfg.dis_q)
    else:
        positions_ = jnp.zeros((keys_.shape[0], cfg.num_anchors))

    if cfg.level == "graph":
        # Mean-pool valid rows into one entry per graph; one-hot graph label
        # (``RAGraph_graph/ragraph_utils/ToyGraphBase.py:116-123``).
        m = sample_mask.astype(keys_.dtype)[:, None]
        denom = jnp.maximum(m.sum(), 1.0)
        keys_ = ((keys_ * m).sum(0) / denom)[None, :]
        values_ = ((values_ * m).sum(0) / denom)[None, :]
        labels_ = graph_onehot[None, :]
        positions_ = jnp.zeros((1, cfg.num_anchors))
        valid = jnp.ones((1,), dtype=bool) & graph_valid

    return keys_, values_, labels_, positions_, valid


def build_entries_batch(encoder_fn: Callable, features, adjs, labels,
                        node_masks, graph_onehots, cfg: LibraryConfig,
                        key: jax.Array):
    """Entries for a whole *batch* of padded graphs, all copies.

    Args:
      features: ``(B, N, F)``; adjs: ``(B, N, N)`` normalized clean
      adjacency; labels: ``(B, N, C)``; node_masks: ``(B, N)``;
      graph_onehots: ``(B, C)`` (graph-level labels; ignored for
      ``level='node'``).

    Returns flattened ``(B * copies * rows, ...)`` entry arrays + validity.
    The whole thing is one ``vmap`` over B×copies — the TPU replacement for
    the reference's batch-size-1 Python loop
    (``RAGraph_node/ragraph_utils/ToyGraphBase.py:40-45``).
    """
    b = features.shape[0]
    copies = 1 + cfg.num_augment_scale

    def per_graph(f, a, y, m, gy, k):
        if cfg.num_augment_scale > 0 or cfg.num_inverse_sample > 0:
            sample_prob = inverse_sample_prob_dense(a, m)
        else:
            # PageRank feeds only augmentation/inverse-sampling; skip the
            # power iteration entirely on the clean path
            sample_prob = jnp.zeros((f.shape[0],))

        def per_copy(i):
            k_i = jax.random.fold_in(k, i)
            k_f, k_a, k_e = jax.random.split(k_i, 3)
            aug_f = jax.lax.cond(
                i > 0,
                lambda: augment_features(k_f, f, sample_prob),
                lambda: f)
            aug_a = jax.lax.cond(
                i > 0,
                lambda: augment_adj(k_a, a, sample_prob, m),
                lambda: a)
            return _entries_one_copy(encoder_fn, aug_f, aug_a, a, y, m, gy,
                                     cfg, k_e)

        return jax.vmap(per_copy)(jnp.arange(copies))

    keys = jax.random.split(key, b)
    out = jax.vmap(per_graph)(features, adjs, labels, node_masks,
                              graph_onehots, keys)
    # (B, copies, rows, ...) -> flatten leading three axes
    return tuple(x.reshape((-1,) + x.shape[3:]) for x in out)


def build_library(lib: ToyGraphLibrary, encoder_fn: Callable, batches,
                  cfg: LibraryConfig, key: jax.Array) -> ToyGraphLibrary:
    """Fill the library from an iterable of padded graph-batch dicts.

    Each batch dict needs ``features (B,N,F)``, ``adj (B,N,N)``,
    ``labels (B,N,C)``, ``node_mask (B,N)`` and, for graph-level libraries,
    ``graph_onehot (B,C)``. Appends (never resets): repeated calls grow
    the store, matching ``build_toy_graph``'s semantics
    (``RAGraph_node/finetune-rag.py:97``).
    """
    return build_library_with(lib, encoder_fn, batches, cfg, key,
                              append_fn=library_append)


def build_library_with(lib: ToyGraphLibrary, encoder_fn: Callable, batches,
                       cfg: LibraryConfig, key: jax.Array,
                       append_fn: Callable) -> ToyGraphLibrary:
    """Shared build loop: jitted entry construction per batch, then
    ``append_fn(lib, keys, values, labels, positions, valid)``. The
    sharded store (``parallel/sharded_library.py``) reuses this with its
    shard_map append."""
    build = jax.jit(partial(build_entries_batch, encoder_fn, cfg=cfg))
    for i, batch in enumerate(batches):
        k_i = jax.random.fold_in(key, i)
        gy = batch.get("graph_onehot")
        if gy is None:
            gy = jnp.zeros((batch["features"].shape[0],
                            batch["labels"].shape[-1]))
        keys_, values_, labels_, positions_, valid = build(
            batch["features"], batch["adj"], batch["labels"],
            batch["node_mask"], gy, key=k_i)
        lib = append_fn(lib, keys_, values_, labels_, positions_, valid)
    return lib


# ---------------------------------------------------------------------------
# Query phase
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "add_noise"))
def retrieve(lib: ToyGraphLibrary, search_keys: jax.Array,
             cfg: LibraryConfig, *, add_noise: bool = False,
             key: jax.Array | None = None,
             search_positions: jax.Array | None = None):
    """Top-k retrieval with optional adversarial noise.

    Parity:
    - semantic path: cosine top-k
      (``RAGraph_node/ragraph_utils/ToyGraphBase.py:47-71``), with
      ``k = 2*retrieve_num`` under noise (node/graph variants);
    - structure path: weighted sum of position-code similarity and
      semantic similarity
      (``RAGraph_node_fewshot/ragraph_utils/ToyGraphBase.py:47-63``);
    - noise: ``rows`` appends ``noise_retrieve_num`` uniformly random
      library rows (node variant ``:72-79``); ``gaussian`` perturbs the
      retrieved values (graph variant ``:131-134``).

    Returns ``(rag_embeddings (Q,K,E), rag_labels (Q,K,C))``.
    """
    res_keys, res_values, res_labels, res_positions = lib.live()
    valid = lib.valid_mask

    k_retrieve = 2 * cfg.retrieve_num if add_noise else cfg.retrieve_num

    if cfg.structure_weight != 0.0 and search_positions is not None:
        q_sem = l2_normalize(search_keys)
        sem = jnp.dot(q_sem, l2_normalize(res_keys).T,
                      preferred_element_type=jnp.float32)
        q_pos = l2_normalize(search_positions)
        struct = jnp.dot(q_pos, l2_normalize(res_positions).T,
                         preferred_element_type=jnp.float32)
        scores = cfg.structure_weight * struct + cfg.semantic_weight * sem
        scores = jnp.where(valid[None, :], scores, -jnp.inf)
        _, topk_idx = jax.lax.top_k(scores, k_retrieve)
    else:
        _, topk_idx = cosine_topk(search_keys, res_keys, k_retrieve,
                                  valid_mask=valid,
                                  score_dtype=cfg.retrieve_dtype,
                                  rescore_pad=cfg.retrieve_rescore_pad)

    rag_embeddings = topk_gather(res_values, topk_idx)
    rag_labels = topk_gather(res_labels, topk_idx)

    if add_noise:
        assert key is not None, "noise retrieval needs a PRNG key"
        if cfg.noise_mode == "rows":
            noise_idx = jax.random.randint(
                key, (search_keys.shape[0], cfg.noise_retrieve_num),
                0, jnp.maximum(lib.fill, 1))
            rag_embeddings = jnp.concatenate(
                [rag_embeddings, topk_gather(res_values, noise_idx)], axis=1)
            rag_labels = jnp.concatenate(
                [rag_labels, topk_gather(res_labels, noise_idx)], axis=1)
        elif cfg.noise_mode == "gaussian":
            rag_embeddings = rag_embeddings + cfg.noise_std * \
                jax.random.normal(key, rag_embeddings.shape)

    return rag_embeddings, rag_labels
