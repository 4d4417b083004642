"""GraphPro-plugin baselines: SGL / SimGCL / MixGCF (+ plugin LightGCN).

Parity targets (``RAGraph_edge/modules/plugins/``):
- ``GraphProPluginModel`` (``GraphProPluginModel.py:12-60``): the temporal
  gating engine shared by the plugins — identical to
  :class:`TemporalLightGCN` except the fine-tune gate has no dropout and
  the ``vanilla`` phase disables time encoding. Here it is
  :class:`PluginBase` (``emb_dropout=0`` + ``use_time`` off in vanilla).
- ``SGL`` (``SGL.py:30-120``): BPR + reg + λ·InfoNCE between two extra
  edge-subsampled views (keep 0.9 of the surviving edges), temperature
  ``temp``, over the *uniqued* batch users/items (``:111-113`` — the
  dynamic-shape ``torch.unique`` becomes a fixed-size ``jnp.unique`` with
  a validity mask).
- ``SimGCL`` (``SimGCL.py:21-110``): rec loss zeroed (``:82``), λ·(user CL
  + item CL at temperature 0.2) with per-layer perturbation
  ``eps · sign(h) · normalize(U)`` (``:55-57``).
- ``MixGCF`` (``MixGCF.py:14-120``): hard negatives synthesized by
  positive mixing + hop mixing over the layer-stacked embeddings
  (``:66-85``); BPR against the hop-summed synthetic negative.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ragraph_tpu.models.edge.base import (bpr_loss, cal_infonce,
                                          edge_drop_mask, reg_loss_emb,
                                          relative_time_encoding,
                                          unique_padded)
from ragraph_tpu.models.edge.ragraph_edge import TemporalLightGCN


class PluginBase(TemporalLightGCN):
    """GraphProPluginModel engine: time encoding off in vanilla, plain
    (dropout-free) learned gate at finetune."""

    use_rag = False

    @property
    def use_time(self):  # type: ignore[override]
        return self.phase != "vanilla"

    def _gate(self, params, all_emb, key, training):
        # finetune gate without emb_dropout (GraphProPluginModel.py:46)
        if self.phase == "finetune":
            from ragraph_tpu.nn.gating import learned_gate
            return learned_gate(all_emb, params["gating_weight"],
                                params["gating_bias"], 0.0, None)
        return super()._gate(params, all_emb, key, training)

    def init_params(self, key, pretrained_tables=None):
        params = super().init_params(key, pretrained_tables)
        params.pop("user_lora", None)
        params.pop("item_lora", None)
        return params

    # Hooks for the dynamic-GNN crosses (plugin_dynamic/*_dynamic.py):
    # _evolve runs once on the gated table (EvolveGCN-H/-O);
    # _layer_fuse runs on each propagated layer (ROLAND GRU fusion).
    def _evolve(self, params, all_emb):
        return all_emb

    def _layer_fuse(self, params, h, layer_idx):
        return h

    # Hook for the graphprompt crosses (plugin_gp/*_gp.py): runs on each
    # hop's aggregated output BEFORE SimGCL's perturbation, matching the
    # reference order (prompt the messages, then noise the prompted h so
    # the noise sees sign(h·p) and propagates forward prompted).
    def _hop_prompt(self, params, h):
        return h

    def _propagated(self, params, key, training, edge_mask,
                    return_layers=False, perturb_key=None, graph=None,
                    edge_mask_send=None, time_scale: float = 1.0):
        g = self.graph if graph is None else graph
        cfg = self.cfg
        weights, w_send, impl = self._edge_weights(
            g, edge_mask, edge_mask_send, time_scale=time_scale)
        u, it = self._effective_tables(params, key, training)
        all_emb = jnp.concatenate([u, it], axis=0)
        all_emb = self._gate(params, all_emb, key, training)
        all_emb = self._evolve(params, all_emb)

        layers = [all_emb]
        h = all_emb
        for l in range(cfg.num_layers):
            h = self._prop_layer(g, h, weights, w_send, impl)
            h = self._layer_fuse(params, h, l)
            h = self._hop_prompt(params, h)
            if perturb_key is not None:
                # SimGCL per-layer perturbation (SimGCL.py:55-57)
                noise = jax.random.uniform(
                    jax.random.fold_in(perturb_key, l), h.shape)
                noise = noise / jnp.maximum(
                    jnp.linalg.norm(noise, axis=-1, keepdims=True), 1e-12)
                h = h + jnp.sign(h) * noise * cfg.eps
            layers.append(h)
        if return_layers:
            return layers
        return sum(layers)

    def forward(self, params, *, key=None, training=False, edge_mask=None,
                edge_mask_send=None, time_scale: float = 1.0,
                max_time_step=None, perturb_key=None, graph=None,
                resources=None):
        g = self.graph if graph is None else graph
        res = self._propagated(params, key, training, edge_mask,
                               perturb_key=perturb_key, graph=g,
                               edge_mask_send=edge_mask_send,
                               time_scale=time_scale)
        return res[: g.num_users], res[g.num_users:]


class SGLPlugin(PluginBase):
    """SGL: edge-drop contrastive views on top of BPR."""

    def cal_loss(self, params, batch, key, graph=None, resources=None):
        users, pos_items, neg_items = batch
        cfg = self.cfg
        g = self.graph if graph is None else graph
        k_drop, k_fwd, k_v1, k_v2, k_cl = jax.random.split(key, 5)
        keep = 1.0 - cfg.edge_dropout
        mask, mask_s = self._drop_masks(k_drop, g, keep)

        # time_scale=1/keep keeps the static-time half of the edge weights
        # expectation-preserving under dropout (docs/PARITY.md), matching
        # TemporalLightGCN.cal_loss and the reference's per-step renorm.
        user_emb, item_emb = self.forward(params, key=k_fwd, training=True,
                                          edge_mask=mask,
                                          edge_mask_send=mask_s, graph=g,
                                          time_scale=1.0 / keep)
        rec = bpr_loss(user_emb[users], item_emb[pos_items],
                       item_emb[neg_items])
        u_t, i_t = self._effective_tables(params, None, False)
        reg = cfg.weight_decay * reg_loss_emb(u_t, i_t, users, pos_items,
                                              neg_items)

        # two extra 0.9-keep subsamples of the surviving edges (SGL.py:96-97)
        v1, v1_s = self._drop_masks(k_v1, g, 0.9)
        v2, v2_s = self._drop_masks(k_v2, g, 0.9)
        m1, m2 = mask & v1, mask & v2
        m1_s = mask_s & v1_s if mask_s is not None else None
        m2_s = mask_s & v2_s if mask_s is not None else None
        view_scale = 1.0 / (keep * 0.9)
        u1, i1 = self.forward(params, key=k_fwd, training=True, edge_mask=m1,
                              edge_mask_send=m1_s, graph=g,
                              time_scale=view_scale)
        u2, i2 = self.forward(params, key=k_fwd, training=True, edge_mask=m2,
                              edge_mask_send=m2_s, graph=g,
                              time_scale=view_scale)

        uu, um = unique_padded(users, users.shape[0])
        iu, im = unique_padded(pos_items, pos_items.shape[0])
        view1 = jnp.concatenate([u1[uu], i1[iu]], axis=0)
        view2 = jnp.concatenate([u2[uu], i2[iu]], axis=0)
        vmask = jnp.concatenate([um, im], axis=0)
        cl = cfg.lbd * cal_infonce(view1, view2, cfg.temp, mask=vmask)

        loss = rec + reg + cl
        return loss, {"rec_loss": rec, "reg_loss": reg, "cl_loss": cl}


class SimGCLPlugin(PluginBase):
    """SimGCL: embedding-perturbation contrastive (no BPR term).

    The standalone model zeroes the BPR term (``SimGCL.py:82``), but the
    reference's SimGCL *crosses* keep it active — both the dynamic
    crosses (``plugin_dynamic/SimGCL_dynamic.py:41-56``: plain forward
    on the same dropped subgraph, then the two perturbed CL views) and
    the prompt crosses (``plugin_gp/SimGCL_gp.py:80-91``).
    ``make_dynamic`` / ``make_prompted`` flip ``bpr_in_cal_loss``.
    """

    bpr_in_cal_loss = False

    def cal_loss(self, params, batch, key, graph=None, resources=None):
        users, pos_items, neg_items = batch
        cfg = self.cfg
        g = self.graph if graph is None else graph
        k_drop, k_fwd, k_p1, k_p2 = jax.random.split(key, 4)
        # fixed 0.5 keep rate (SimGCL.py:74)
        mask, mask_s = self._drop_masks(k_drop, g, 0.5)

        u_t, i_t = self._effective_tables(params, None, False)
        reg = cfg.weight_decay * reg_loss_emb(u_t, i_t, users, pos_items,
                                              neg_items)

        uv1, iv1 = self.forward(params, key=k_fwd, training=True,
                                edge_mask=mask, edge_mask_send=mask_s,
                                perturb_key=k_p1, graph=g, time_scale=2.0)
        uv2, iv2 = self.forward(params, key=k_fwd, training=True,
                                edge_mask=mask, edge_mask_send=mask_s,
                                perturb_key=k_p2, graph=g, time_scale=2.0)
        uu, um = unique_padded(users, users.shape[0])
        iu, im = unique_padded(pos_items, pos_items.shape[0])
        cl = cfg.lbd * (cal_infonce(uv1[uu], uv2[uu], 0.2, mask=um)
                        + cal_infonce(iv1[iu], iv2[iu], 0.2, mask=im))

        if self.bpr_in_cal_loss:
            # crosses: plain (unperturbed) forward on the SAME dropped
            # subgraph feeds the BPR term (SimGCL_dynamic.py:47-51,
            # SimGCL_gp.py:80-91)
            u_p, i_p = self.forward(params, key=k_fwd, training=True,
                                    edge_mask=mask, edge_mask_send=mask_s,
                                    graph=g, time_scale=2.0)
            rec = bpr_loss(u_p[users], i_p[pos_items], i_p[neg_items])
        else:
            rec = jnp.float32(0.0)  # SimGCL.py:82 zeroes the BPR term
        loss = rec + reg + cl
        return loss, {"rec_loss": rec, "reg_loss": reg, "cl_loss": cl}


class MixGCFPlugin(PluginBase):
    """MixGCF: positive-mixing + hop-mixing hard negative synthesis."""

    # EdgeTrainer samples (B, n_negs) candidate negatives instead of (B,)
    # (MixGCF.py:60 n_negs candidates per positive)
    multi_negs = True

    def _mix_negatives(self, user_layers, item_layers, users, neg_candidates,
                       pos_items, key):
        """(MixGCF.py:66-85): per (user, positive), mix the positive into
        ``n_negs`` candidate negatives per hop with random convex weights,
        then pick the hardest candidate per hop by inner-product score."""
        s_e = user_layers[users]                      # (B, L+1, E)
        p_e = item_layers[pos_items]                  # (B, L+1, E)
        n_e = item_layers[neg_candidates]             # (B, n_negs, L+1, E)
        b, n_negs, hops, e = n_e.shape
        seed = jax.random.uniform(key, (b, 1, hops, 1))
        mixed = seed * p_e[:, None, :, :] + (1 - seed) * n_e
        scores = jnp.einsum("ble,bnle->bnl", s_e, mixed)   # (B, n_negs, L+1)
        hard = jnp.argmax(scores, axis=1)                  # (B, L+1)
        hard = jax.lax.stop_gradient(hard)
        picked = jnp.take_along_axis(
            mixed, hard[:, None, :, None], axis=1)[:, 0]   # (B, L+1, E)
        return picked

    def cal_loss(self, params, batch, key, graph=None, resources=None):
        """``batch`` = (users, pos_items, neg_candidates (B, n_negs))."""
        users, pos_items, neg_candidates = batch
        cfg = self.cfg
        g = self.graph if graph is None else graph
        k_drop, k_fwd, k_mix = jax.random.split(key, 3)
        keep = 1.0 - cfg.edge_dropout
        mask, mask_s = self._drop_masks(k_drop, g, keep)

        layers = self._propagated(params, k_fwd, True, mask,
                                  return_layers=True, graph=g,
                                  edge_mask_send=mask_s,
                                  time_scale=1.0 / keep)
        stacked = jnp.stack(layers, axis=1)            # (N, L+1, E)
        user_layers = stacked[: g.num_users]
        item_layers = stacked[g.num_users:]
        user_emb = stacked[: g.num_users].sum(axis=1)
        item_emb = stacked[g.num_users:].sum(axis=1)

        neg_emb = self._mix_negatives(user_layers, item_layers, users,
                                      neg_candidates, pos_items,
                                      k_mix).sum(axis=1)
        rec = bpr_loss(user_emb[users], item_emb[pos_items], neg_emb)
        u_t, i_t = self._effective_tables(params, None, False)
        # reference reg spans the FULL flat (B*n_negs) candidate tensor
        # (MixGCF.py:98 passes the un-reshaped neg_items into _reg_loss,
        # still divided by B) — an n_negs-fold stronger negative-norm
        # penalty than one candidate would give
        reg = cfg.weight_decay * reg_loss_emb(u_t, i_t, users, pos_items,
                                              neg_candidates.reshape(-1))
        loss = rec + reg
        return loss, {"rec_loss": rec, "reg_loss": reg}


class LightGCNPlugin(PluginBase):
    """Plugin-flavor LightGCN (``plugins/LightGCN.py:20``): the PluginBase
    engine with plain BPR (inherits TemporalLightGCN.cal_loss)."""
