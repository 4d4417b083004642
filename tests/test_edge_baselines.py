"""Tests for the plugin / dynamic / prompt baseline model families."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from ragraph_tpu.data.edgelist import load_edge_dataset
from ragraph_tpu.data.synthetic import synthetic_edge_stream
from ragraph_tpu.models.edge import (EdgeGraphArrays, EdgeModelConfig,
                                     EvolveGCNH, EvolveGCNO,
                                     GraphPromptEdge, LightGCNPlugin,
                                     MixGCFPlugin, Roland, SGLPlugin,
                                     SimGCLPlugin, ema_merge, gru_cell,
                                     gru_cell_init, make_prompted)


@pytest.fixture(scope="module")
def setup():
    train, stages = synthetic_edge_stream(seed=3, num_users=32,
                                          num_items=64, num_stages=1,
                                          interactions_per_user=8)
    ds = load_edge_dataset(train, [(u, i) for (u, i, _) in stages[0]])
    g = EdgeGraphArrays.from_dataset(ds)
    cfg = EdgeModelConfig(emb_size=16, num_layers=2, batch_size=64,
                          edge_dropout=0.3, n_negs=4)
    batch = (jnp.arange(16, dtype=jnp.int32),
             jnp.arange(16, dtype=jnp.int32),
             jnp.arange(16, 32, dtype=jnp.int32))
    return ds, g, cfg, batch


class TestGRU:
    def test_gru_gates_bounded(self):
        params = gru_cell_init(jr.key(0), 8)
        x = jnp.ones((4, 8))
        h = jnp.zeros((4, 8))
        out = gru_cell(params, x, h)
        assert out.shape == (4, 8)
        assert np.all(np.abs(np.asarray(out)) <= 1.0)  # (1-z)*tanh + z*0

    def test_gru_identity_at_full_update(self):
        """z -> 1 keeps the hidden state."""
        params = gru_cell_init(jr.key(1), 4)
        params = dict(params, b_ih=params["b_ih"].at[4:8].set(100.0))
        h = jnp.asarray(np.random.default_rng(0)
                        .normal(size=(3, 4)).astype(np.float32))
        out = gru_cell(params, jnp.zeros((3, 4)), h)
        np.testing.assert_allclose(np.asarray(out), np.asarray(h), atol=1e-4)

    def test_ema_merge(self):
        cur = {"a": jnp.ones((2,))}
        meta = {"a": jnp.zeros((2,))}
        out = ema_merge(cur, meta, meta_weight=0.9)
        np.testing.assert_allclose(np.asarray(out["a"]), 0.1, atol=1e-6)


class TestPlugins:
    def test_sgl_loss_finite_and_has_cl(self, setup):
        ds, g, cfg, batch = setup
        m = SGLPlugin(cfg, g, phase="pretrain")
        params = m.init_params(jr.key(0))
        loss, aux = m.cal_loss(params, batch, jr.key(1))
        assert np.isfinite(float(loss))
        assert float(aux["cl_loss"]) != 0.0

    def test_simgcl_no_rec_term(self, setup):
        ds, g, cfg, batch = setup
        m = SimGCLPlugin(cfg, g, phase="pretrain")
        params = m.init_params(jr.key(0))
        loss, aux = m.cal_loss(params, batch, jr.key(1))
        assert float(aux["rec_loss"]) == 0.0
        assert np.isfinite(float(loss))

    def test_simgcl_perturbation_changes_views(self, setup):
        ds, g, cfg, batch = setup
        m = SimGCLPlugin(cfg, g, phase="pretrain")
        params = m.init_params(jr.key(0))
        u1, _ = m.forward(params, perturb_key=jr.key(1))
        u2, _ = m.forward(params, perturb_key=jr.key(2))
        u0, _ = m.forward(params)
        assert not np.allclose(np.asarray(u1), np.asarray(u2))
        assert not np.allclose(np.asarray(u1), np.asarray(u0))

    def test_simgcl_bpr_zeroed_standalone_active_in_crosses(self, setup):
        """SimGCL.py:82 zeroes the BPR term in the standalone model, but
        the reference's crosses keep it (SimGCL_dynamic.py:41-56,
        SimGCL_gp.py:80-91) — make_dynamic/make_prompted flip
        bpr_in_cal_loss."""
        from ragraph_tpu.models.edge.dynamic import make_dynamic
        from ragraph_tpu.models.edge.graphprompt import make_prompted
        ds, g, cfg, batch = setup
        m = SimGCLPlugin(cfg, g, phase="pretrain")
        params = m.init_params(jr.key(0))
        _, aux = m.cal_loss(params, batch, jr.key(1))
        assert float(aux["rec_loss"]) == 0.0

        crossed = make_dynamic(SimGCLPlugin, "evolvegcn_o")(
            cfg, g, phase="pretrain")
        cp = crossed.init_params(jr.key(0))
        _, aux_c = crossed.cal_loss(cp, batch, jr.key(1))
        assert float(aux_c["rec_loss"]) > 0.0

        prompted = make_prompted(SimGCLPlugin, "gpf")(
            cfg, g, phase="pretrain")
        pp = prompted.init_params(jr.key(0))
        _, aux_p = prompted.cal_loss(pp, batch, jr.key(1))
        assert float(aux_p["rec_loss"]) > 0.0

    def test_mixgcf_hard_negatives(self, setup):
        ds, g, cfg, batch = setup
        m = MixGCFPlugin(cfg, g, phase="pretrain")
        params = m.init_params(jr.key(0))
        users, pos, _ = batch
        negs = jnp.asarray(np.random.default_rng(0).integers(
            0, ds.num_items, size=(16, cfg.n_negs)), dtype=jnp.int32)
        loss, aux = m.cal_loss(params, (users, pos, negs), jr.key(1))
        assert np.isfinite(float(loss))

    def test_plugin_lightgcn_and_grads(self, setup):
        ds, g, cfg, batch = setup
        m = LightGCNPlugin(cfg, g, phase="pretrain")
        params = m.init_params(jr.key(0))
        grads = jax.grad(lambda p: m.cal_loss(p, batch, jr.key(1))[0])(params)
        gnorm = float(jnp.linalg.norm(grads["user_embedding"]))
        assert np.isfinite(gnorm) and gnorm > 0

    def test_plugin_losses_pass_time_scale(self, setup, monkeypatch):
        """ADVICE r2 (medium): plugin cal_loss must renormalize the
        static-time half of the edge weights by 1/keep under dropout,
        like TemporalLightGCN.cal_loss does."""
        ds, g, cfg, batch = setup
        for cls, keeps in ((SGLPlugin,
                            [1.0 - cfg.edge_dropout,
                             (1.0 - cfg.edge_dropout) * 0.9,
                             (1.0 - cfg.edge_dropout) * 0.9]),
                           (SimGCLPlugin, [0.5, 0.5])):
            m = cls(cfg, g, phase="pretrain")
            params = m.init_params(jr.key(0))
            seen = []
            orig = cls.forward

            def spy(self, p, **kw):
                seen.append(kw.get("time_scale", 1.0))
                return orig(self, p, **kw)

            monkeypatch.setattr(cls, "forward", spy)
            m.cal_loss(params, batch, jr.key(1))
            monkeypatch.undo()
            np.testing.assert_allclose(seen, [1.0 / k for k in keeps],
                                       rtol=1e-6)

        # MixGCF goes through _propagated directly
        m = MixGCFPlugin(cfg, g, phase="pretrain")
        params = m.init_params(jr.key(0))
        seen = []
        orig = MixGCFPlugin._propagated

        def spy(self, *a, **kw):
            seen.append(kw.get("time_scale", 1.0))
            return orig(self, *a, **kw)

        monkeypatch.setattr(MixGCFPlugin, "_propagated", spy)
        negs = jnp.asarray(np.random.default_rng(0).integers(
            0, ds.num_items, size=(16, cfg.n_negs)), dtype=jnp.int32)
        m.cal_loss(params, (batch[0], batch[1], negs), jr.key(1))
        monkeypatch.undo()
        np.testing.assert_allclose(seen, [1.0 / (1.0 - cfg.edge_dropout)],
                                   rtol=1e-6)

    def test_static_time_dropout_expectation_preserved(self, setup):
        """With static time + 1/keep rescale, the TIME half of the masked
        edge weights matches the unmasked time softmax in expectation
        (the docs/PARITY.md contract that time_scale exists to uphold)."""
        ds, g, cfg, batch = setup
        m = SGLPlugin(cfg, g, phase="pretrain")
        assert m.use_time and cfg.time_mode == "static"
        keep = 0.7
        norm_half = np.asarray(g.edge_norm) * 0.5
        time_half_full = np.asarray(g.time_norm) * 0.5
        n_trials = 400
        acc = 0.0
        for s in range(n_trials):
            mask, mask_s = m._drop_masks(jr.key(s), g, keep)
            w, _, _ = m._edge_weights(g, mask, mask_s,
                                      time_scale=1.0 / keep)
            mk = np.asarray(mask)
            acc += (np.asarray(w) - np.where(mk, norm_half, 0.0)).sum()
        np.testing.assert_allclose(acc / n_trials, time_half_full.sum(),
                                   rtol=0.05)

    def test_plugin_vanilla_phase_no_time(self, setup):
        ds, g, cfg, batch = setup
        m = SGLPlugin(cfg, g, phase="vanilla")
        assert m.use_time is False
        m2 = SGLPlugin(cfg, g, phase="pretrain")
        assert m2.use_time is True


class TestDynamic:
    def test_evolvegcn_o(self, setup):
        ds, g, cfg, batch = setup
        m = EvolveGCNO(cfg, g)
        params = m.init_params(jr.key(0))
        loss, _ = m.cal_loss(params, batch, jr.key(1))
        assert np.isfinite(float(loss))

    def test_evolvegcn_h_needs_last_emb(self, setup):
        ds, g, cfg, batch = setup
        m = EvolveGCNH(cfg, g)
        params = m.init_params(jr.key(0))
        m.set_last_emb(jnp.zeros((g.num_nodes, cfg.emb_size)))
        u, i = m.forward(params)
        assert u.shape == (g.num_users, cfg.emb_size)
        loss, _ = m.cal_loss(params, batch, jr.key(1))
        assert np.isfinite(float(loss))

    def test_roland_meta_fusion(self, setup):
        ds, g, cfg, batch = setup
        m = Roland(cfg, g)
        params = m.init_params(jr.key(0))
        # meta layers from the plain lgn path of the same params
        meta_layers = m.forward_lgn(params, return_layers=True)
        m.set_meta_layers(meta_layers)
        u, i = m.forward(params)
        assert u.shape == (g.num_users, cfg.emb_size)
        loss, _ = m.cal_loss(params, batch, jr.key(1))
        assert np.isfinite(float(loss))


class TestGraphPrompt:
    @pytest.mark.parametrize("mode", ["graphprompt", "gpf"])
    def test_prompt_modes(self, setup, mode):
        ds, g, cfg, batch = setup
        m = GraphPromptEdge(cfg, g, prompt_mode=mode)
        params = m.init_params(jr.key(0))
        assert "prompt_vec" in params
        loss, _ = m.cal_loss(params, batch, jr.key(1))
        assert np.isfinite(float(loss))
        # prompt must receive gradient
        grads = jax.grad(lambda p: m.cal_loss(p, batch, jr.key(1))[0])(params)
        assert float(jnp.abs(grads["prompt_vec"]).sum()) > 0

    def test_graphprompt_scaling_matches_per_message(self, setup):
        """layer_l * p^l == per-hop message prompting (commutation)."""
        ds, g, cfg, batch = setup
        m = GraphPromptEdge(cfg, g, prompt_mode="graphprompt")
        params = m.init_params(jr.key(0))
        u1, i1 = m.forward(params)
        # manual per-message application
        import jax.numpy as jnp
        all_emb = jnp.concatenate([params["user_embedding"],
                                   params["item_embedding"]], axis=0)
        p = params["prompt_vec"]
        layers = [all_emb]
        h = all_emb
        for _ in range(cfg.num_layers):
            msgs = (h[g.senders] * g.edge_norm[:, None]) * p
            h = jax.ops.segment_sum(msgs, g.receivers,
                                    num_segments=g.num_nodes)
            layers.append(h)
        res = sum(layers)
        np.testing.assert_allclose(np.asarray(u1),
                                   np.asarray(res[: g.num_users]),
                                   atol=1e-5)

    def test_prompted_plugin_cross(self, setup):
        ds, g, cfg, batch = setup
        cls = make_prompted(SGLPlugin, "graphprompt")
        m = cls(cfg, g, phase="pretrain")
        params = m.init_params(jr.key(0))
        assert "prompt_vec" in params
        loss, _ = m.cal_loss(params, batch, jr.key(1))
        assert np.isfinite(float(loss))

    def test_prompted_lightgcn_prompt_is_live(self, setup):
        """The CLI maps --model LightGCN --prompt X to LightGCNPlugin:
        LightGCNEdge's fused forward never calls _propagated, so a
        graphprompt cross over it would silently train a dead prompt
        (zero gradient, output independent of prompt_vec)."""
        from ragraph_tpu.models.edge import LightGCNPlugin
        ds, g, cfg, batch = setup
        cls = make_prompted(LightGCNPlugin, "graphprompt")
        m = cls(cfg, g, phase="pretrain")
        params = m.init_params(jr.key(0))
        grads = jax.grad(
            lambda p: m.cal_loss(p, batch, jr.key(1))[0])(params)
        assert float(jnp.abs(grads["prompt_vec"]).sum()) > 0
        # and the output must actually depend on the prompt
        u1, _ = m.forward(params)
        params2 = dict(params, prompt_vec=params["prompt_vec"] + 1.0)
        u2, _ = m.forward(params2)
        assert float(jnp.abs(u1 - u2).max()) > 1e-6

    def test_simgcl_graphprompt_order_matches_reference(self, setup):
        """SimGCL x graphprompt: the prompt multiplies each hop BEFORE
        the perturbation (``plugin_gp/SimGCL_gp.py:136-140`` adds
        ``sign(h_prompted)·normalize(noise)·eps`` and propagates the
        noisy prompted h forward) — post-scaling layers by ``p^l`` does
        not commute with the noise and was wrong for this cross."""
        from ragraph_tpu.models.edge import SimGCLPlugin
        ds, g, cfg, batch = setup
        cls = make_prompted(SimGCLPlugin, "graphprompt")
        m = cls(cfg, g, phase="vanilla")
        params = m.init_params(jr.key(0))
        pk = jr.key(5)
        got = m._propagated(params, None, False, None, perturb_key=pk)

        all_emb = jnp.concatenate([params["user_embedding"],
                                   params["item_embedding"]], axis=0)
        p = params["prompt_vec"]
        layers = [all_emb]
        h = all_emb
        for l in range(cfg.num_layers):
            msgs = h[g.senders] * g.edge_norm[:, None]
            h = jax.ops.segment_sum(msgs, g.receivers,
                                    num_segments=g.num_nodes) * p
            noise = jr.uniform(jr.fold_in(pk, l), h.shape)
            noise = noise / jnp.maximum(
                jnp.linalg.norm(noise, axis=-1, keepdims=True), 1e-12)
            h = h + jnp.sign(h) * noise * cfg.eps
            layers.append(h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(sum(layers)),
                                   atol=1e-5)


class TestDynamicCrosses:
    @pytest.mark.parametrize("mode", ["roland", "evolvegcn_h", "evolvegcn_o"])
    def test_sgl_cross(self, setup, mode):
        from ragraph_tpu.models.edge import make_dynamic
        ds, g, cfg, batch = setup
        cls = make_dynamic(SGLPlugin, mode)
        m = cls(cfg, g, phase="pretrain")
        assert m.use_time is False
        params = m.init_params(jr.key(0))
        assert "gru" in params
        if mode == "roland":
            # meta layers from a plain plugin forward of the same params
            base = SGLPlugin(cfg, g, phase="pretrain")
            layers = base._propagated(params, None, False, None,
                                      return_layers=True)
            m.set_meta_layers(layers)
        elif mode == "evolvegcn_h":
            m.set_last_emb(jnp.zeros((g.num_nodes, cfg.emb_size)))
        loss, aux = m.cal_loss(params, batch, jr.key(1))
        assert np.isfinite(float(loss))
        assert "cl_loss" in aux

    def test_simgcl_cross_evolve_o(self, setup):
        from ragraph_tpu.models.edge import make_dynamic
        ds, g, cfg, batch = setup
        cls = make_dynamic(SimGCLPlugin, "evolvegcn_o")
        m = cls(cfg, g, phase="pretrain")
        params = m.init_params(jr.key(0))
        loss, aux = m.cal_loss(params, batch, jr.key(1))
        assert np.isfinite(float(loss))


def test_bilinear_discriminator2():
    from ragraph_tpu.nn import BilinearDiscriminator2
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    hp = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    hm = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
    model = BilinearDiscriminator2(8)
    params = model.init(jr.key(0), c, hp, hm)
    out = model.apply(params, c, hp, hm)
    assert out.shape == (10,)
    w = params["params"]["bilinear_w"]
    ref = np.sum((np.asarray(hp) @ np.asarray(w)) * np.asarray(c), -1)
    np.testing.assert_allclose(np.asarray(out[:5]), ref, atol=1e-5)


def test_staged_dynamic_roland():
    from ragraph_tpu.data.synthetic import synthetic_edge_stream
    from ragraph_tpu.models.edge import (EdgeGraphArrays, EdgeModelConfig,
                                         GraphPro, Roland, staged_dynamic)
    from ragraph_tpu.data.edgelist import load_edge_dataset
    from ragraph_tpu.train import EdgeTrainer
    train, stages = synthetic_edge_stream(seed=4, num_users=24, num_items=48,
                                          num_stages=2,
                                          interactions_per_user=6)
    cfg = EdgeModelConfig(emb_size=8, num_layers=2, batch_size=32,
                          edge_dropout=0.2, early_stop_patience=3)
    ds = load_edge_dataset(train, [(u, i) for (u, i, _) in stages[0]])
    pre = GraphPro(cfg, EdgeGraphArrays.from_dataset(ds), phase="pretrain")
    pre_params = pre.init_params(jr.key(0))
    tables = {"user_embedding": np.asarray(pre_params["user_embedding"]),
              "item_embedding": np.asarray(pre_params["item_embedding"])}
    res = staged_dynamic(train, stages[0], [stages[0], stages[1]], tables,
                         cfg_factory=lambda phase: cfg, key=jr.key(1),
                         model_cls=Roland, mode="roland", num_epochs=2,
                         logger=lambda *_: None)
    assert len(res.recalls) == 2
    assert all(np.isfinite(res.recalls))
