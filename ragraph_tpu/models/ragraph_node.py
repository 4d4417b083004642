"""RAGraph node-classification task model.

Parity target: ``RAGraph_node/RAGraph.py:10-63`` —
``forward(features, adj)``: frozen-encoder embeddings → library retrieval →
fusion:

    hidden = (1-w_r)·khop(query) + w_r·Σ(rag_emb)
    logits = (1-w_l)·softmax(decoder(hidden)) + w_l·mean(rag_labels)

Training-free mode returns ``mean(rag_labels)`` alone (``:60-63``).

TPU-native structure: the model is a pytree ``RAGraphNodeState`` (encoder
params + decoder params + library) with pure jitted step functions —
training steps, eval, and library build all compile once per bucket shape.
Gradients flow into BOTH encoder and decoder during fine-tune, matching the
reference optimizer over ``rag_model.parameters()``
(``RAGraph_node/finetune-rag.py:73``); the library tensors are buffers
(stop-gradient) exactly like the reference's non-parameter tensors.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ragraph_tpu.core.graph import DenseGraph, _pytree_dataclass
from ragraph_tpu.models.preprompt import PrePrompt
from ragraph_tpu.nn.heads import TaskDecoder
from ragraph_tpu.ops.propagation import aggregate_k_hop_dense
from ragraph_tpu.rag.library import (LibraryConfig, ToyGraphLibrary,
                                     build_library, library_init, retrieve)


@dataclasses.dataclass(frozen=True)
class RAGraphNodeConfig:
    """Hyperparameters (``RAGraph_node/RAGraph.py:18-27``)."""

    emb_size: int = 256
    num_class: int = 3
    retrieve_weight: float = 0.5
    label_weight: float = 0.5
    query_graph_hop: int = 3
    finetune: bool = True
    noise_finetune: bool = False
    encoder_layers: int = 1
    encoder_dropout: float = 0.3
    library: LibraryConfig = dataclasses.field(default_factory=LibraryConfig)


@_pytree_dataclass
class RAGraphNodeState:
    encoder_params: Any
    decoder_params: Any
    library: ToyGraphLibrary


class RAGraphNode:
    """Bundles the modules + pure step functions for the node task."""

    def __init__(self, cfg: RAGraphNodeConfig, feature_dim: int):
        self.cfg = cfg
        self.encoder = PrePrompt(hidden=cfg.emb_size,
                                 num_layers=cfg.encoder_layers,
                                 dropout=cfg.encoder_dropout)
        self.decoder = TaskDecoder(hidden=cfg.emb_size, out=cfg.num_class)
        self.feature_dim = feature_dim

    # -- initialization ----------------------------------------------------

    def init_state(self, key: jax.Array, encoder_params=None,
                   library_capacity: int = 4096) -> RAGraphNodeState:
        k_enc, k_dec = jax.random.split(key)
        if encoder_params is None:
            dummy_x = jnp.zeros((8, self.feature_dim))
            dummy_a = jnp.eye(8)
            encoder_params = self.encoder.init(
                k_enc, dummy_x, dummy_a,
                method=self.encoder.inference)
        decoder_params = self.decoder.init(
            k_dec, jnp.zeros((1, self.cfg.emb_size)))
        lib = library_init(library_capacity, self.cfg.emb_size,
                           self.cfg.num_class,
                           num_anchors=self.cfg.library.num_anchors)
        return RAGraphNodeState(encoder_params=encoder_params,
                                decoder_params=decoder_params,
                                library=lib)

    def encoder_fn(self, params):
        def fn(features, adj, node_mask=None):
            return self.encoder.apply(params, features, adj, node_mask,
                                      method=self.encoder.inference)
        return fn

    # -- library build -----------------------------------------------------

    def build_library(self, state: RAGraphNodeState, stacked_batches,
                      key: jax.Array) -> RAGraphNodeState:
        """Append entries for each stacked batch (reference semantics:
        repeated ``build_toy_graph`` calls APPEND, they never reset —
        ``RAGraph_node/finetune-rag.py:97`` grows the train-built library
        with val entries before test)."""
        lib = build_library(state.library,
                            self.encoder_fn(state.encoder_params),
                            stacked_batches, self.cfg.library, key)
        return dataclasses.replace(state, library=lib)

    # -- forward -----------------------------------------------------------

    def forward(self, state: RAGraphNodeState, graph: DenseGraph,
                *, training: bool = False, key: jax.Array | None = None,
                rngs: dict | None = None) -> jax.Array:
        """Label logits ``(N, C)`` (probabilities, reference-faithful)."""
        cfg = self.cfg
        emb = self.encoder.apply(state.encoder_params, graph.features,
                                 graph.adj, graph.node_mask,
                                 method=self.encoder.inference)

        add_noise = training and cfg.noise_finetune
        rag_emb, rag_labels = retrieve(
            jax.lax.stop_gradient(state.library), emb, cfg.library,
            add_noise=add_noise, key=key)

        rag_label = jnp.mean(rag_labels, axis=1)
        if not cfg.finetune:
            return rag_label

        rag_embedding = jnp.sum(rag_emb, axis=1)
        query = aggregate_k_hop_dense(graph.adj, emb, cfg.query_graph_hop)
        hidden = (1.0 - cfg.retrieve_weight) * query \
            + cfg.retrieve_weight * rag_embedding
        decoded = jax.nn.softmax(
            self.decoder.apply(state.decoder_params, hidden), axis=-1)
        return (1.0 - cfg.label_weight) * decoded \
            + cfg.label_weight * rag_label

    # -- training ----------------------------------------------------------

    def loss(self, state: RAGraphNodeState, graph: DenseGraph,
             key: jax.Array | None = None) -> jax.Array:
        """Masked soft-target cross entropy, matching
        ``F.cross_entropy(logits, onehot)`` on probability "logits"
        (``RAGraph_node/finetune-rag.py:81``)."""
        logits = self.forward(state, graph, training=True, key=key)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_node = -jnp.sum(graph.labels * logp, axis=-1)
        m = graph.node_mask.astype(per_node.dtype)
        return jnp.sum(per_node * m) / jnp.maximum(jnp.sum(m), 1.0)

    def make_train_step(self, optimizer: optax.GradientTransformation):
        """Jitted SGD step over (encoder, decoder) params."""

        def train_step(state: RAGraphNodeState, opt_state, graph: DenseGraph,
                       key: jax.Array):
            def loss_fn(params):
                s = dataclasses.replace(state,
                                        encoder_params=params["encoder"],
                                        decoder_params=params["decoder"])
                return self.loss(s, graph, key)

            params = {"encoder": state.encoder_params,
                      "decoder": state.decoder_params}
            loss_val, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            state = dataclasses.replace(state,
                                        encoder_params=params["encoder"],
                                        decoder_params=params["decoder"])
            return state, opt_state, loss_val

        return jax.jit(train_step)

    def accuracy(self, state: RAGraphNodeState, graphs) -> float:
        """Masked argmax accuracy over an iterable of DenseGraph batches."""
        predict = jax.jit(lambda s, g: self.forward(s, g))
        correct = total = 0
        for g in graphs:
            logits = predict(state, g)
            pred = jnp.argmax(logits, axis=-1)
            true = jnp.argmax(g.labels, axis=-1)
            ok = (pred == true) & g.node_mask
            correct += int(ok.sum())
            total += int(g.node_mask.sum())
        return correct / max(total, 1)
