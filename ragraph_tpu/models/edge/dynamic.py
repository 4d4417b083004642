"""Dynamic-graph baselines: ROLAND and EvolveGCN-H/-O.

Parity targets (``RAGraph_edge/modules/dynamicGNN/``):
- ``roland`` (``roland.py:35-133``): per-layer GRU fusing the current
  propagation output with the *meta model*'s same-layer embeddings
  (``:115-133``); meta update is an EMA
  ``new = 0.1·current + 0.9·meta`` (``average_state_dict`` with w=0.9,
  ``:61-77``).
- ``evolveGCN_H`` (``evolveGCN_H.py:19-70``): one GRU step over the
  embedding table against the previous step's embeddings, then plain
  LightGCN propagation.
- ``evolveGCN_O`` (``evolveGCN_O.py:20-72``): GRUCell self-evolution
  ``h' = GRU(h, h)`` before propagation.

None of these use time encoding or gating (plain binorm LightGCN).
The GRU cell is a functional torch-parity implementation
(``r,z = σ(W x + U h + b)``, ``n = tanh(W_n x + r∘(U_n h + b_hn))``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ragraph_tpu.models.edge.base import (bpr_loss, lightgcn_propagate,
                                          reg_loss_emb)
from ragraph_tpu.models.edge.ragraph_edge import TemporalLightGCN


def gru_cell_init(key: jax.Array, size: int) -> dict:
    """Torch-GRUCell-parity params: stacked (3H, H) weights + biases."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(size)
    u = lambda k, shape: jax.random.uniform(k, shape, minval=-bound,
                                            maxval=bound)
    return {"w_ih": u(k1, (3 * size, size)), "w_hh": u(k2, (3 * size, size)),
            "b_ih": u(k3, (3 * size,)), "b_hh": u(k4, (3 * size,))}


def gru_cell(params: dict, x: jax.Array, h: jax.Array) -> jax.Array:
    """One GRU step with torch gate ordering (reset, update, new)."""
    size = h.shape[-1]
    gi = x @ params["w_ih"].T + params["b_ih"]
    gh = h @ params["w_hh"].T + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1 - z) * n + z * h


def ema_merge(current: dict, meta: dict, meta_weight: float = 0.9) -> dict:
    """ROLAND meta update: ``(1-w)·current + w·meta`` per tensor
    (``roland.py:20-33,61-77``)."""
    return jax.tree.map(lambda a, b: (1 - meta_weight) * a + meta_weight * b,
                        current, meta)


def make_dynamic(plugin_cls, mode: str):
    """Cross a plugin loss with a dynamic embedding evolution
    (``modules/dynamicGNN/plugin_dynamic/{SGL,SimGCL,MixGCF}_dynamic.py``).

    ``mode``: ``"roland"`` (per-layer GRU vs meta-model layers),
    ``"evolvegcn_h"`` (GRU vs previous-step embeddings),
    ``"evolvegcn_o"`` (GRUCell self-evolution). The crosses run the plain
    (non-temporal) propagation like the reference's ``BaseModel_1``.
    """
    assert mode in ("roland", "evolvegcn_h", "evolvegcn_o")

    class Crossed(plugin_cls):
        use_time = False  # BaseModel_1 has no time encoding
        # the SimGCL crosses RESTORE the BPR term the standalone model
        # zeroes (plugin_dynamic/SimGCL_dynamic.py:41-56); no-op for
        # SGL/MixGCF whose cal_loss always includes it
        bpr_in_cal_loss = True

        def _gate(self, params, all_emb, key, training):
            # the cross BaseModel_1 has NO emb_gate in any phase
            # (*_dynamic.py hardcodes phase='vanilla'; only the GRU
            # evolution touches the tables) — bypass the plugin
            # finetune gate
            return all_emb

        def __init__(self, cfg, graph, phase: str = "finetune",
                     mesh=None):
            super().__init__(cfg, graph, phase, mesh=mesh)
            self.meta_layers = None
            self.last_emb = None

        def init_params(self, key, pretrained_tables=None):
            params = super().init_params(key, pretrained_tables)
            # no gating params either (see _gate above)
            params.pop("gating_weight", None)
            params.pop("gating_bias", None)
            params["gru"] = gru_cell_init(jax.random.fold_in(key, 37),
                                          self.cfg.emb_size)
            return params

        def set_meta_layers(self, meta_layers):
            self.meta_layers = [jax.lax.stop_gradient(m)
                                for m in meta_layers]

        def propagated_plain(self, params, return_layers=True):
            """Layerwise propagation with the ROLAND fusion bypassed —
            used to compute the meta-model layers themselves (the
            reference's meta model is a plain propagation,
            ``dynamicGNN/plugin_dynamic/SGL_dynamic.py:189-209``)."""
            self._computing_meta = True
            try:
                return self._propagated(params, None, False, None,
                                        return_layers=return_layers)
            finally:
                self._computing_meta = False

        def set_last_emb(self, last_emb):
            self.last_emb = jax.lax.stop_gradient(last_emb)

        def _evolve(self, params, all_emb):
            if mode == "evolvegcn_o":
                return gru_cell(params["gru"], all_emb, all_emb)
            if mode == "evolvegcn_h":
                assert self.last_emb is not None, "set_last_emb first"
                return gru_cell(params["gru"], all_emb, self.last_emb)
            return all_emb

        _computing_meta = False

        def _layer_fuse(self, params, h, layer_idx):
            if mode == "roland" and not self._computing_meta:
                assert self.meta_layers is not None, "set_meta_layers first"
                return gru_cell(params["gru"], h,
                                self.meta_layers[layer_idx + 1])
            return h

    Crossed.__name__ = f"{plugin_cls.__name__}_{mode}"
    return Crossed


class DynamicBase(TemporalLightGCN):
    """Plain LightGCN engine (no time, no gate) for the dynamic models."""

    use_time = False
    use_rag = False

    def _gate(self, params, all_emb, key, training):
        return all_emb

    def _plain_layers(self, params, edge_mask, all_emb, graph=None,
                      edge_mask_send=None):
        g = self.graph if graph is None else graph
        weights, w_send, impl = self._edge_weights(g, edge_mask,
                                                   edge_mask_send)
        import jax as _jax
        return lightgcn_propagate(all_emb, g.senders, g.receivers, weights,
                                  g.num_nodes, self.cfg.num_layers,
                                  recv_indptr=g.recv_indptr, impl=impl,
                                  weights_send=w_send,
                                  recv_of_send=g.recv_of_send,
                                  send_indptr=g.send_indptr,
                                  bf16=self._bf16(),
                                  interpret=_jax.default_backend() == "cpu")

    def _bpr_step(self, params, batch, key, forward_fn, graph=None):
        g = self.graph if graph is None else graph
        users, pos_items, neg_items = batch
        mask, mask_send = self._drop_masks(key, g,
                                           1.0 - self.cfg.edge_dropout)
        user_emb, item_emb = forward_fn(params, edge_mask=mask,
                                        edge_mask_send=mask_send)
        rec = bpr_loss(user_emb[users], item_emb[pos_items],
                       item_emb[neg_items])
        reg = self.cfg.weight_decay * reg_loss_emb(
            params["user_embedding"], params["item_embedding"], users,
            pos_items, neg_items)
        return rec + reg, {"rec_loss": rec, "reg_loss": reg}


class Roland(DynamicBase):
    """ROLAND: layerwise GRU against the meta model's layer embeddings."""

    def __init__(self, cfg, graph, phase: str = "finetune", mesh=None):
        super().__init__(cfg, graph, phase, mesh=mesh)
        self.meta_layers = None  # list[(N, E)] from the meta model

    def init_params(self, key, pretrained_tables=None):
        params = super().init_params(key, pretrained_tables)
        params.pop("gating_weight", None)
        params.pop("gating_bias", None)
        params["gru"] = gru_cell_init(jax.random.fold_in(key, 17),
                                      self.cfg.emb_size)
        return params

    def set_meta_layers(self, meta_layers):
        """Layerwise embeddings [(N, E)] of the meta model (lgn path)."""
        self.meta_layers = [jax.lax.stop_gradient(m) for m in meta_layers]

    def forward_lgn(self, params, *, edge_mask=None, edge_mask_send=None,
                    return_layers=False, graph=None, **_):
        g = self.graph if graph is None else graph
        all_emb = jnp.concatenate([params["user_embedding"],
                                   params["item_embedding"]], axis=0)
        layers = self._plain_layers(params, edge_mask, all_emb, graph=g,
                                    edge_mask_send=edge_mask_send)
        if return_layers:
            return layers
        res = sum(layers)
        return res[: g.num_users], res[g.num_users:]

    def forward(self, params, *, key=None, training=False, edge_mask=None,
                edge_mask_send=None, graph=None, **_):
        assert self.meta_layers is not None, "call set_meta_layers first"
        g = self.graph if graph is None else graph
        weights, w_send, impl = self._edge_weights(g, edge_mask,
                                                   edge_mask_send)
        all_emb = jnp.concatenate([params["user_embedding"],
                                   params["item_embedding"]], axis=0)
        layers = [all_emb]
        h = all_emb
        for l in range(self.cfg.num_layers):
            h = self._prop_layer(g, h, weights, w_send, impl)
            h = gru_cell(params["gru"], h, self.meta_layers[l + 1])
            layers.append(h)
        res = sum(layers)
        return res[: g.num_users], res[g.num_users:]

    def cal_loss(self, params, batch, key, graph=None, resources=None):
        return self._bpr_step(
            params, batch, key,
            lambda p, **kw: self.forward(p, graph=graph, **kw),
            graph=graph)


class EvolveGCNH(DynamicBase):
    """EvolveGCN-H: GRU over the table vs the previous step's embeddings."""

    def __init__(self, cfg, graph, phase: str = "finetune", mesh=None):
        super().__init__(cfg, graph, phase, mesh=mesh)
        self.last_emb = None  # (N, E) embeddings from the previous step

    def init_params(self, key, pretrained_tables=None):
        params = super().init_params(key, pretrained_tables)
        params.pop("gating_weight", None)
        params.pop("gating_bias", None)
        params["gru"] = gru_cell_init(jax.random.fold_in(key, 19),
                                      self.cfg.emb_size)
        return params

    def set_last_emb(self, last_emb):
        self.last_emb = jax.lax.stop_gradient(last_emb)

    def forward(self, params, *, key=None, training=False, edge_mask=None,
                edge_mask_send=None, graph=None, **_):
        assert self.last_emb is not None, "call set_last_emb first"
        g = self.graph if graph is None else graph
        all_emb = jnp.concatenate([params["user_embedding"],
                                   params["item_embedding"]], axis=0)
        all_emb = gru_cell(params["gru"], all_emb, self.last_emb)
        layers = self._plain_layers(params, edge_mask, all_emb, graph=g,
                                    edge_mask_send=edge_mask_send)
        res = sum(layers)
        return res[: g.num_users], res[g.num_users:]

    def cal_loss(self, params, batch, key, graph=None, resources=None):
        return self._bpr_step(
            params, batch, key,
            lambda p, **kw: self.forward(p, graph=graph, **kw),
            graph=graph)


class EvolveGCNO(DynamicBase):
    """EvolveGCN-O: GRUCell self-evolution of the embedding table."""

    def init_params(self, key, pretrained_tables=None):
        params = super().init_params(key, pretrained_tables)
        params.pop("gating_weight", None)
        params.pop("gating_bias", None)
        params["gru"] = gru_cell_init(jax.random.fold_in(key, 23),
                                      self.cfg.emb_size)
        return params

    def forward(self, params, *, key=None, training=False, edge_mask=None,
                edge_mask_send=None, graph=None, **_):
        g = self.graph if graph is None else graph
        all_emb = jnp.concatenate([params["user_embedding"],
                                   params["item_embedding"]], axis=0)
        all_emb = gru_cell(params["gru"], all_emb, all_emb)
        layers = self._plain_layers(params, edge_mask, all_emb, graph=g,
                                    edge_mask_send=edge_mask_send)
        res = sum(layers)
        return res[: g.num_users], res[g.num_users:]

    def cal_loss(self, params, batch, key, graph=None, resources=None):
        return self._bpr_step(
            params, batch, key,
            lambda p, **kw: self.forward(p, graph=graph, **kw),
            graph=graph)
