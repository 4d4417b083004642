"""Few-shot RAGraph task models (node- and graph-level).

Parity targets:
- node fewshot: ``RAGraph_node_fewshot/RAGraph.py:8-83`` — the frozen
  2-layer encoder is split into ``encode`` (layer 1, retrieval keys,
  no-grad) and ``decode`` (layer 2, trainable); retrieved labels map
  through class-prototype logits ``mean_fewshot_logits[argmax(rag_labels)]``
  (``:52-55``); fusion outputs an H-dim vector classified by cosine to the
  class prototypes (``finetune-rag.py:99-104``).
- graph fewshot: ``RAGraph_graph_fewshot/RAGraph.py:46-87`` — node-level
  retrieval inside each graph, per-node decode + fusion, then mean over
  nodes → one H-dim logit per graph (``:84``).
- library build uses ``encode`` embeddings and the live
  structure-similarity path (``RAGraph_node_fewshot/ragraph_utils/
  ToyGraphBase.py:28-29,47-63,91``).

TPU-native notes: the support prototypes are recomputed inside the loss
(differentiable, matching the reference recomputing them every step,
``finetune-rag.py:96-99``); the graph-level variant vmaps the whole
per-graph pipeline over stacked batches instead of batch-size-1 loops.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ragraph_tpu.core.graph import _pytree_dataclass
from ragraph_tpu.models.preprompt import PrePrompt
from ragraph_tpu.ops.propagation import aggregate_k_hop_dense
from ragraph_tpu.ops.shortest_path import position_aware_codes
from ragraph_tpu.rag.fewshot import (fewshot_mean_logits,
                                     fewshot_predict_labels,
                                     fewshot_predict_logits)
from ragraph_tpu.rag.library import (LibraryConfig, build_library,
                                     library_init, retrieve)

# RAGraph_node_fewshot/RAGraph.py:24-33 / RAGraph_graph_fewshot/RAGraph.py:15-29
FEWSHOT_NODE_WEIGHTS = {"ENZYMES": (0.5, 0.5), "PROTEINS": (0.3, 0.8)}
FEWSHOT_GRAPH_WEIGHTS = {"ENZYMES": (0.3, 0.8), "PROTEINS": (0.5, 0.5),
                         "COX2": (0.3, 0.6), "BZR": (0.1, 0.5)}


def fewshot_library_config(retrieve_num: int = 5, **overrides) -> LibraryConfig:
    """Fewshot defaults (``RAGraph_node_fewshot/.../ToyGraphBase.py:17-29``)."""
    defaults = dict(
        level="node", num_inverse_sample=10, num_augment_scale=3,
        retrieve_num=retrieve_num, noise_retrieve_num=1, noise_mode="rows",
        use_positions=True, num_anchors=10, dis_q=10,
        structure_weight=0.001, semantic_weight=0.999, toy_graph_hop=2,
    )
    defaults.update(overrides)
    return LibraryConfig(**defaults)


@dataclasses.dataclass(frozen=True)
class RAGraphFewshotConfig:
    emb_size: int = 256
    num_class: int = 3
    level: str = "node"              # "node" | "graph"
    retrieve_weight: float = 0.5
    label_weight: float = 0.5
    query_graph_hop: int = 3         # 1 for the graph-level variant
    finetune: bool = True
    noise_finetune: bool = False
    encoder_layers: int = 2          # encode/decode split needs ≥2
    encoder_dropout: float = 0.3
    library: LibraryConfig = dataclasses.field(
        default_factory=fewshot_library_config)


@_pytree_dataclass
class FewshotSupportSet:
    """The k-shot support set.

    Node level: ``features (S, F)`` / ``adj (S, S)`` / ``labels (S,)``
    per support node, ``graph_ids=None``.

    Graph level (``RAGraph_graph_fewshot/finetune-rag.py:62-76`` — the
    support is whole graphs; node logits are mean-pooled per support
    graph before prototyping): ``features`` / ``adj`` stack the support
    graphs' nodes block-diagonally, ``labels (G,)`` is one class id per
    support GRAPH, and ``graph_ids (S,)`` maps each support node to its
    graph (the segment form of the reference's ``graph_len`` cursor
    loop).
    """

    features: jax.Array   # (S, F) support node features
    adj: jax.Array        # (S, S)
    labels: jax.Array     # (S,) node class ids | (G,) graph class ids
    graph_ids: Any = None  # None | (S,) int graph segment ids


@_pytree_dataclass
class RAGraphFewshotState:
    encoder_params: Any
    library: Any
    support: FewshotSupportSet


class RAGraphFewshot:
    """Few-shot RAGraph with encode/decode-split encoder."""

    def __init__(self, cfg: RAGraphFewshotConfig, feature_dim: int):
        assert cfg.encoder_layers >= 2, "fewshot needs an encode/decode split"
        self.cfg = cfg
        self.encoder = PrePrompt(hidden=cfg.emb_size,
                                 num_layers=cfg.encoder_layers,
                                 dropout=cfg.encoder_dropout)
        self.feature_dim = feature_dim

    def init_state(self, key: jax.Array, support: FewshotSupportSet,
                   encoder_params=None,
                   library_capacity: int = 4096) -> RAGraphFewshotState:
        if encoder_params is None:
            encoder_params = self.encoder.init(
                key, jnp.zeros((8, self.feature_dim)), jnp.eye(8),
                method=self.encoder.inference)
        lib = library_init(library_capacity, self.cfg.emb_size,
                           self.cfg.num_class,
                           num_anchors=self.cfg.library.num_anchors)
        return RAGraphFewshotState(encoder_params=encoder_params,
                                   library=lib, support=support)

    # -- encoder splits ----------------------------------------------------

    def _encode(self, params, features, adj, node_mask=None):
        """Layer-1 embeddings, frozen (torch.no_grad in the reference,
        ``RAGraph_node_fewshot/models/gcnlayers.py:62-74``)."""
        h = self.encoder.apply(params, features, adj, node_mask,
                               method=self.encoder.encode)
        return jax.lax.stop_gradient(h)

    def _decode(self, params, hidden, adj, node_mask=None):
        return self.encoder.apply(params, hidden, adj, node_mask,
                                  method=self.encoder.decode)

    def prototypes(self, params, support: FewshotSupportSet) -> jax.Array:
        """Class-prototype logits from the support set (recomputed with the
        current params each step, differentiable).

        With ``support.graph_ids`` set (graph level), node logits are
        mean-pooled per support graph first — the reference's
        ``calculate_mean_logits`` graph_len cursor loop
        (``RAGraph_graph_fewshot/finetune-rag.py:62-76``) as one segment
        reduction.
        """
        logits = self.encoder.apply(params, support.features, support.adj,
                                    method=self.encoder.inference)
        if support.graph_ids is not None:
            num_graphs = support.labels.shape[0]
            logits = fewshot_mean_logits(logits, support.graph_ids,
                                         num_graphs)
        return fewshot_mean_logits(logits, support.labels,
                                   self.cfg.num_class)

    # -- library -----------------------------------------------------------

    def build_library(self, state: RAGraphFewshotState, stacked_batches,
                      key: jax.Array) -> RAGraphFewshotState:
        params = state.encoder_params

        def enc_fn(features, adj, node_mask=None):
            return self._encode(params, features, adj, node_mask)

        lib = build_library(state.library, enc_fn, stacked_batches,
                            self.cfg.library, key)
        return dataclasses.replace(state, library=lib)

    # -- forward -----------------------------------------------------------

    def _fuse_one(self, params, library, protos, features, adj, node_mask,
                  *, training: bool, key):
        """Per-(sub)graph fusion producing H-dim label logits per node."""
        cfg = self.cfg
        emb = self._encode(params, features, adj, node_mask)

        add_noise = training and cfg.noise_finetune
        if key is not None:
            k_pos, k_noise = jax.random.split(key)
        else:
            # eval without an explicit key: anchors from a fixed key (the
            # reference redraws random anchors every retrieve; any anchor
            # draw is valid, a fixed one makes eval deterministic)
            k_pos, k_noise = jax.random.key(0), None
        search_positions = None
        if cfg.library.use_positions and cfg.library.structure_weight != 0.0:
            search_positions = position_aware_codes(
                adj, k_pos, node_mask, num_anchors=cfg.library.num_anchors,
                dis_q=cfg.library.dis_q)
        rag_emb, rag_labels = retrieve(
            jax.lax.stop_gradient(library), emb, cfg.library,
            add_noise=add_noise, key=k_noise,
            search_positions=search_positions)

        # map retrieved one-hot labels through class prototypes (:52-55)
        rag_idx = jnp.argmax(rag_labels, axis=-1)            # (N, K)
        rag_logits = jnp.mean(protos[rag_idx], axis=1)       # (N, H)
        if not cfg.finetune:
            return rag_logits

        rag_embedding = jnp.sum(rag_emb, axis=1)
        query = aggregate_k_hop_dense(adj, emb, cfg.query_graph_hop)
        hidden = (1.0 - cfg.retrieve_weight) * query \
            + cfg.retrieve_weight * rag_embedding
        decode_logits = self._decode(params, hidden, adj, node_mask)
        return (1.0 - cfg.label_weight) * decode_logits \
            + cfg.label_weight * rag_logits

    def forward_node(self, state: RAGraphFewshotState, graph, *,
                     training: bool = False, key=None,
                     protos=None) -> jax.Array:
        """Node-level H-dim label logits over a flat DenseGraph batch.

        ``protos``: pass precomputed prototypes to avoid re-running the
        support-set encoder (the loss functions already computed them).
        """
        if protos is None:
            protos = self.prototypes(state.encoder_params, state.support)
        return self._fuse_one(state.encoder_params, state.library, protos,
                              graph.features, graph.adj, graph.node_mask,
                              training=training, key=key)

    def forward_graph(self, state: RAGraphFewshotState, batch: dict, *,
                      training: bool = False, key=None,
                      protos=None) -> jax.Array:
        """Graph-level H-dim logits (mean over node logits,
        ``RAGraph_graph_fewshot/RAGraph.py:84``) over a stacked batch.

        ``protos`` as in :meth:`forward_node`.
        """
        if protos is None:
            protos = self.prototypes(state.encoder_params, state.support)
        b = batch["features"].shape[0]
        keys = (jax.random.split(key, b) if key is not None
                else jnp.zeros((b, 2), jnp.uint32))

        def per_graph(f, a, m, k):
            node_logits = self._fuse_one(
                state.encoder_params, state.library, protos, f, a, m,
                training=training, key=(k if key is not None else None))
            mf = m.astype(node_logits.dtype)[:, None]
            return (node_logits * mf).sum(0) / jnp.maximum(mf.sum(), 1.0)

        return jax.vmap(per_graph)(batch["features"], batch["adj"],
                                   batch["node_mask"], keys)

    # -- training ----------------------------------------------------------

    def loss_node(self, state: RAGraphFewshotState, graph,
                  key=None) -> jax.Array:
        """CE over cosine-to-prototype scores
        (``finetune-rag.py:99-104``)."""
        protos = self.prototypes(state.encoder_params, state.support)
        logits = self.forward_node(state, graph, training=True, key=key,
                                   protos=protos)
        class_scores = fewshot_predict_logits(protos, logits)
        logp = jax.nn.log_softmax(class_scores, axis=-1)
        per_node = -jnp.sum(graph.labels * logp, axis=-1)
        m = graph.node_mask.astype(per_node.dtype)
        return jnp.sum(per_node * m) / jnp.maximum(m.sum(), 1.0)

    def loss_graph(self, state: RAGraphFewshotState, batch: dict,
                   key=None) -> jax.Array:
        """Graph-level CE over cosine-to-prototype scores
        (``RAGraph_graph_fewshot/finetune-rag.py`` protocol)."""
        protos = self.prototypes(state.encoder_params, state.support)
        logits = self.forward_graph(state, batch, training=True, key=key,
                                    protos=protos)
        class_scores = fewshot_predict_logits(protos, logits)
        logp = jax.nn.log_softmax(class_scores, axis=-1)
        per_graph = -jnp.sum(batch["graph_onehot"] * logp, axis=-1)
        gmask = batch["node_mask"].any(axis=1).astype(per_graph.dtype)
        return jnp.sum(per_graph * gmask) / jnp.maximum(gmask.sum(), 1.0)

    def make_train_step_graph(self, optimizer):
        def step(state, opt_state, batch, key):
            def loss_fn(p):
                s = dataclasses.replace(state, encoder_params=p)
                return self.loss_graph(s, batch, key)
            loss_val, grads = jax.value_and_grad(loss_fn)(
                state.encoder_params)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  state.encoder_params)
            new_params = optax.apply_updates(state.encoder_params, updates)
            return (dataclasses.replace(state, encoder_params=new_params),
                    opt_state, loss_val)
        return jax.jit(step)

    def make_train_step_node(self, optimizer):
        def step(state, opt_state, graph, key):
            def loss_fn(p):
                s = dataclasses.replace(state, encoder_params=p)
                return self.loss_node(s, graph, key)
            loss_val, grads = jax.value_and_grad(loss_fn)(
                state.encoder_params)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  state.encoder_params)
            new_params = optax.apply_updates(state.encoder_params, updates)
            return (dataclasses.replace(state, encoder_params=new_params),
                    opt_state, loss_val)
        return jax.jit(step)

    def accuracy_node(self, state: RAGraphFewshotState, graphs) -> float:
        protos = self.prototypes(state.encoder_params, state.support)
        predict = jax.jit(lambda s, g: fewshot_predict_labels(
            protos, self.forward_node(s, g)))
        correct = total = 0
        for g in graphs:
            pred = predict(state, g)
            true = jnp.argmax(g.labels, axis=-1)
            correct += int(((pred == true) & g.node_mask).sum())
            total += int(g.node_mask.sum())
        return correct / max(total, 1)

    def accuracy_graph(self, state: RAGraphFewshotState, batches) -> float:
        protos = self.prototypes(state.encoder_params, state.support)
        predict = jax.jit(lambda s, b: fewshot_predict_labels(
            protos, self.forward_graph(s, b)))
        correct = total = 0
        for b in batches:
            pred = predict(state, b)
            true = jnp.argmax(b["graph_onehot"], axis=-1)
            gmask = b["node_mask"].any(axis=1)
            correct += int(((pred == true) & gmask).sum())
            total += int(gmask.sum())
        return correct / max(total, 1)
