"""Prompt-tuning baselines: GraphPrompt (multiplicative) and GPF (additive).

Parity target: ``GP`` (``RAGraph_edge/modules/graphprompt/GP.py:10-113``):
a frozen-ish LightGCN (no time, no gate) fine-tuned through a single
``(1, E)`` prompt vector —

- ``graphprompt``: the prompt multiplies the *source messages inside every
  aggregation* (``GP.py:52-54``);
- ``gpf``: the prompt is added to the node embeddings once before
  propagation (``GP.py:66-68``).

The ``{SGL, SimGCL, MixGCF}_gp.py`` crosses apply the same prompt on top
of the corresponding plugin engines; here the prompt mode composes with
any :class:`PluginBase` subclass via :func:`make_prompted`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ragraph_tpu.models.edge.base import (bpr_loss, edge_drop_mask,
                                          reg_loss_emb)
from ragraph_tpu.models.edge.ragraph_edge import TemporalLightGCN, xavier


class GraphPromptEdge(TemporalLightGCN):
    """The GP baseline: plain LightGCN + learnable prompt vector."""

    use_time = False
    use_rag = False

    def __init__(self, cfg, graph, phase: str = "finetune",
                 prompt_mode: str = "graphprompt", mesh=None):
        assert prompt_mode in ("graphprompt", "gpf")
        super().__init__(cfg, graph, phase, mesh=mesh)
        self.prompt_mode = prompt_mode

    def _gate(self, params, all_emb, key, training):
        return all_emb

    def init_params(self, key, pretrained_tables=None):
        params = super().init_params(key, pretrained_tables)
        params.pop("gating_weight", None)
        params.pop("gating_bias", None)
        params.pop("user_lora", None)
        params.pop("item_lora", None)
        params["prompt_vec"] = xavier(jax.random.fold_in(key, 29),
                                      (1, self.cfg.emb_size))
        return params

    def forward(self, params, *, key=None, training=False, edge_mask=None,
                graph=None, **_):
        g = self.graph if graph is None else graph
        cfg = self.cfg
        weights = g.edge_norm
        if edge_mask is not None:
            weights = jnp.where(edge_mask, weights, 0.0)
        all_emb = jnp.concatenate([params["user_embedding"],
                                   params["item_embedding"]], axis=0)
        prompt = params["prompt_vec"]
        if self.prompt_mode == "gpf":
            all_emb = all_emb + prompt

        layers = [all_emb]
        h = all_emb
        for _ in range(cfg.num_layers):
            msgs = h[g.senders] * weights[:, None]
            if self.prompt_mode == "graphprompt":
                msgs = msgs * prompt
            h = jax.ops.segment_sum(msgs, g.receivers,
                                    num_segments=g.num_nodes)
            layers.append(h)
        res = sum(layers)
        return res[: g.num_users], res[g.num_users:]

    def cal_loss(self, params, batch, key, graph=None, resources=None):
        g = self.graph if graph is None else graph
        users, pos_items, neg_items = batch
        mask = edge_drop_mask(key, g.num_edges,
                              1.0 - self.cfg.edge_dropout)
        user_emb, item_emb = self.forward(params, edge_mask=mask, graph=g)
        rec = bpr_loss(user_emb[users], item_emb[pos_items],
                       item_emb[neg_items])
        reg = self.cfg.weight_decay * reg_loss_emb(
            params["user_embedding"], params["item_embedding"], users,
            pos_items, neg_items)
        return rec + reg, {"rec_loss": rec, "reg_loss": reg}


def make_prompted(plugin_cls, prompt_mode: str = "graphprompt"):
    """Cross a plugin engine with a prompt vector (the ``*_gp.py`` files).

    The returned class adds ``prompt_vec``: gpf-style it offsets the
    embedding tables before propagation (exactly the reference);
    graphprompt-style it multiplies every propagated message, realized
    via the :class:`PluginBase` ``_hop_prompt`` hook — the hop-ℓ
    aggregated output is scaled by ``prompt`` INSIDE the propagation
    loop, before SimGCL's per-layer perturbation. For linear hops this
    equals the ``layer_ℓ · prompt^ℓ`` post-scaling (elementwise scale
    commutes with the segment-sum), but under SimGCL the order matters:
    the reference (``plugin_gp/SimGCL_gp.py:136-140``) adds
    ``sign(h·p)·normalize(noise)·eps`` to the *prompted* h and lets that
    noise propagate forward prompted — post-scaling would rescale the
    noise by ``p`` per dim and feed ``sign()`` the unprompted argument.
    """

    class Prompted(plugin_cls):
        # the SimGCL prompt cross keeps the BPR term the standalone
        # model zeroes (plugin_gp/SimGCL_gp.py:80-91); no-op for
        # SGL/MixGCF
        bpr_in_cal_loss = True
        # the gp-cross BaseModel_1 (plugin_gp/*_gp.py:29-55) has NO
        # time encoding and NO emb_gate in any phase — only the
        # prompt vector modulates the tables/messages
        use_time = False

        def _gate(self, params, all_emb, key, training):
            return all_emb

        def init_params(self, key, pretrained_tables=None):
            params = super().init_params(key, pretrained_tables)
            params.pop("gating_weight", None)
            params.pop("gating_bias", None)
            params["prompt_vec"] = xavier(jax.random.fold_in(key, 31),
                                          (1, self.cfg.emb_size))
            return params

        def _effective_tables(self, params, key, training):
            u, it = super()._effective_tables(params, key, training)
            if prompt_mode == "gpf":
                p = params["prompt_vec"]
                return u + p, it + p
            return u, it

        def _hop_prompt(self, params, h):
            if prompt_mode == "graphprompt":
                return h * params["prompt_vec"]
            return h

    Prompted.__name__ = f"{plugin_cls.__name__}_{prompt_mode}"
    return Prompted
