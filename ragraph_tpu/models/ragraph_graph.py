"""RAGraph graph-classification task model.

Parity target: ``RAGraph_graph/RAGraph.py`` — graph-level query key is the
mean node embedding (``:50``), the library holds one mean-pooled entry per
(augmented) resource graph with a one-hot graph label, fusion weights are
per-dataset (``:15-26``), ``query_graph_hop=1`` (``:33``), and noise mode is
additive Gaussian on the retrieved values
(``RAGraph_graph/ragraph_utils/ToyGraphBase.py:131-134``).

TPU-native difference: the reference runs batch_size=1 graphs through the
forward (``RAGraph_graph/finetune-rag.py:27``); here the whole stacked
``(B, N, ...)`` batch is one vmapped jitted program — B graphs per step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from ragraph_tpu.models.preprompt import PrePrompt
from ragraph_tpu.models.ragraph_node import RAGraphNodeState
from ragraph_tpu.nn.heads import TaskDecoder
from ragraph_tpu.ops.propagation import aggregate_k_hop_dense
from ragraph_tpu.rag.library import (LibraryConfig, build_library,
                                     library_init, retrieve)

# Per-dataset fusion weights noted at RAGraph_graph/RAGraph.py:15-24.
GRAPH_FUSION_WEIGHTS = {
    "BZR": (0.1, 0.5),
    "COX2": (0.3, 0.6),
    "PROTEINS": (0.5, 0.5),
    "ENZYMES": (0.3, 0.8),
}


def graph_library_config(num_class: int, **overrides) -> LibraryConfig:
    """Graph-variant defaults (``RAGraph_graph/.../ToyGraphBase.py:21-28``)."""
    defaults = dict(
        level="graph", num_inverse_sample=0, num_augment_scale=0,
        retrieve_num=min(3, num_class + 1), noise_retrieve_num=1,
        noise_mode="gaussian", noise_std=0.01, toy_graph_hop=0,
        use_positions=False,
    )
    defaults.update(overrides)
    return LibraryConfig(**defaults)


@dataclasses.dataclass(frozen=True)
class RAGraphGraphConfig:
    emb_size: int = 256
    num_class: int = 3
    retrieve_weight: float = 0.3
    label_weight: float = 0.3
    query_graph_hop: int = 1
    finetune: bool = True
    noise_finetune: bool = False
    encoder_layers: int = 1
    encoder_dropout: float = 0.3
    library: LibraryConfig = dataclasses.field(
        default_factory=lambda: graph_library_config(3))


class RAGraphGraph:
    """Graph-level RAGraph over stacked padded batches."""

    def __init__(self, cfg: RAGraphGraphConfig, feature_dim: int):
        self.cfg = cfg
        self.encoder = PrePrompt(hidden=cfg.emb_size,
                                 num_layers=cfg.encoder_layers,
                                 dropout=cfg.encoder_dropout)
        self.decoder = TaskDecoder(hidden=cfg.emb_size, out=cfg.num_class)
        self.feature_dim = feature_dim

    def init_state(self, key: jax.Array, encoder_params=None,
                   library_capacity: int = 4096) -> RAGraphNodeState:
        k_enc, k_dec = jax.random.split(key)
        if encoder_params is None:
            encoder_params = self.encoder.init(
                k_enc, jnp.zeros((8, self.feature_dim)), jnp.eye(8),
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

    def build_library(self, state: RAGraphNodeState, stacked_batches,
                      key: jax.Array) -> RAGraphNodeState:
        lib = build_library(state.library,
                            self.encoder_fn(state.encoder_params),
                            stacked_batches, self.cfg.library, key)
        return dataclasses.replace(state, library=lib)

    def forward(self, state: RAGraphNodeState, batch: dict, *,
                training: bool = False,
                key: jax.Array | None = None) -> jax.Array:
        """Per-graph label logits ``(B, C)`` from a stacked batch."""
        cfg = self.cfg

        def encode_one(f, a, m):
            return self.encoder.apply(state.encoder_params, f, a, m,
                                      method=self.encoder.inference)

        emb = jax.vmap(encode_one)(batch["features"], batch["adj"],
                                   batch["node_mask"])        # (B, N, E)
        m = batch["node_mask"].astype(emb.dtype)[:, :, None]
        denom = jnp.maximum(m.sum(axis=1), 1.0)
        graph_query = (emb * m).sum(axis=1) / denom           # (B, E)

        add_noise = training and cfg.noise_finetune
        rag_emb, rag_labels = retrieve(
            jax.lax.stop_gradient(state.library), graph_query, cfg.library,
            add_noise=add_noise, key=key)

        rag_label = jnp.mean(rag_labels, axis=1)              # (B, C)
        if not cfg.finetune:
            return rag_label

        rag_embedding = jnp.sum(rag_emb, axis=1)              # (B, E)
        khop = jax.vmap(lambda a, e: aggregate_k_hop_dense(
            a, e, cfg.query_graph_hop))(batch["adj"], emb)
        query = (khop * m).sum(axis=1) / denom                # (B, E)

        hidden = (1.0 - cfg.retrieve_weight) * query \
            + cfg.retrieve_weight * rag_embedding
        decoded = jax.nn.softmax(
            self.decoder.apply(state.decoder_params, hidden), axis=-1)
        return (1.0 - cfg.label_weight) * decoded \
            + cfg.label_weight * rag_label

    def loss(self, state: RAGraphNodeState, batch: dict,
             key: jax.Array | None = None) -> jax.Array:
        logits = self.forward(state, batch, training=True, key=key)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_graph = -jnp.sum(batch["graph_onehot"] * logp, axis=-1)
        gmask = batch["node_mask"].any(axis=1).astype(per_graph.dtype)
        return jnp.sum(per_graph * gmask) / jnp.maximum(gmask.sum(), 1.0)

    def make_train_step(self, optimizer: optax.GradientTransformation):
        def train_step(state, opt_state, batch, key):
            def loss_fn(params):
                s = dataclasses.replace(state,
                                        encoder_params=params["encoder"],
                                        decoder_params=params["decoder"])
                return self.loss(s, batch, key)

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

    def accuracy(self, state: RAGraphNodeState, batches) -> float:
        predict = jax.jit(lambda s, b: self.forward(s, b))
        correct = total = 0
        for b in batches:
            logits = predict(state, b)
            pred = jnp.argmax(logits, axis=-1)
            true = jnp.argmax(b["graph_onehot"], axis=-1)
            gmask = b["node_mask"].any(axis=1)
            correct += int(((pred == true) & gmask).sum())
            total += int(gmask.sum())
        return correct / max(total, 1)
