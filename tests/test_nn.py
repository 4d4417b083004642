"""Unit tests for NN layers, heads, and the pretrain sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragraph_tpu.models.preprompt import (PrePrompt, prompt_pretrain_sample,
                                          subgraph3_mean)
from ragraph_tpu.nn.gating import learned_gate, random_gate
from ragraph_tpu.nn.heads import TaskDecoder, compare_loss
from ragraph_tpu.nn.layers import DenseGAT, DenseGCN, avg_readout
from ragraph_tpu.nn.lora import apply_lora, svd_init
from ragraph_tpu.nn.stack import GCNStack, MaskedBatchNorm


def random_adj(rng, n, p=0.3):
    a = (rng.random((n, n)) < p).astype(np.float32)
    a = np.triu(a, 1)
    return a + a.T


class TestDenseGCN:
    def test_manual_computation(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
        adj = jnp.asarray(random_adj(rng, 6))
        model = DenseGCN(features=8)
        params = model.init(jax.random.key(0), x, adj)
        out = model.apply(params, x, adj)
        w = params["params"]["Dense_0"]["kernel"]
        b = params["params"]["bias"]
        slope = params["params"]["PReLU_0"]["slope"]
        pre = np.asarray(adj @ (x @ w)) + np.asarray(b)
        ref = np.where(pre >= 0, pre, np.asarray(slope) * pre)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_mask_zeroes_padding(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
        adj = jnp.asarray(random_adj(rng, 6))
        mask = jnp.asarray([True] * 4 + [False] * 2)
        model = DenseGCN(features=8)
        params = model.init(jax.random.key(0), x, adj, mask)
        out = model.apply(params, x, adj, mask)
        assert np.all(np.asarray(out)[4:] == 0)


class TestStack:
    def test_padding_invariance(self):
        """A padded graph must produce identical embeddings for real nodes."""
        rng = np.random.default_rng(2)
        n, f = 8, 5
        x = rng.normal(size=(n, f)).astype(np.float32)
        a = random_adj(rng, n)
        xp = np.zeros((12, f), np.float32)
        xp[:n] = x
        ap = np.zeros((12, 12), np.float32)
        ap[:n, :n] = a
        mask = jnp.asarray(np.arange(12) < n)

        model = GCNStack(hidden=7, num_layers=2)
        params = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(a))
        out_small = model.apply(params, jnp.asarray(x), jnp.asarray(a))
        out_pad = model.apply(params, jnp.asarray(xp), jnp.asarray(ap), mask)
        np.testing.assert_allclose(np.asarray(out_pad)[:n],
                                   np.asarray(out_small), atol=1e-5)

    def test_masked_batchnorm_ignores_padding(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(10, 4)).astype(np.float32)
        mask = np.arange(10) < 7
        model = MaskedBatchNorm(4)
        vars_ = model.init(jax.random.key(0), jnp.asarray(x))
        out_full, _ = model.apply(vars_, jnp.asarray(x[:7]),
                                  mutable=["batch_stats"])
        out_mask, _ = model.apply(vars_, jnp.asarray(x), jnp.asarray(mask),
                                  mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out_mask)[:7],
                                   np.asarray(out_full), atol=1e-5)


class TestHeads:
    def test_compare_loss_matches_reference_math(self):
        """Port of compareloss (RAGraph_node/preprompt.py:80-103)."""
        rng = np.random.default_rng(4)
        feats = rng.normal(size=(6, 8)).astype(np.float32)
        tuples = rng.integers(0, 6, size=(6, 4))
        ours = compare_loss(jnp.asarray(feats),
                            jnp.asarray(tuples), temperature=1.5)

        fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        losses = []
        for i in range(6):
            sims = fn[tuples[i]] @ fn[i]
            exp = np.exp(sims) / 1.5
            losses.append(-np.log(exp[0] / exp[1:].sum()))
        np.testing.assert_allclose(float(ours), np.mean(losses), atol=1e-5)

    def test_task_decoder_shapes(self):
        model = TaskDecoder(hidden=16, out=3)
        params = model.init(jax.random.key(0), jnp.zeros((4, 16)))
        assert model.apply(params, jnp.zeros((4, 16))).shape == (4, 3)


class TestSubgraph3:
    def test_matches_explicit_loop(self):
        """Matmul formulation vs get_subgraph_3 loop semantics
        (RAGraph_node/preprompt.py:8-27)."""
        rng = np.random.default_rng(5)
        n = 7
        a = random_adj(rng, n) + np.eye(n, dtype=np.float32)
        h = rng.normal(size=(n, 3)).astype(np.float32)
        a3 = ((a @ a @ a) > 0).astype(np.float32)
        res = np.zeros_like(h)
        cnt = np.zeros(n)
        for i, j in zip(*np.nonzero(a3)):
            res[i] += h[j]
            cnt[i] += 1
        ref = res / cnt[:, None]
        ours = subgraph3_mean(jnp.asarray(h), jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


class TestPretrainSample:
    def test_tuple_structure(self):
        rng_np = np.random.default_rng(6)
        a = random_adj(rng_np, 20, p=0.2)
        tuples = prompt_pretrain_sample(a, 5, rng_np)
        assert tuples.shape == (20, 6)
        for i in range(20):
            neigh = set(np.nonzero(a[i])[0])
            if neigh:
                assert tuples[i, 0] in neigh
            else:
                assert tuples[i, 0] == i
            for j in tuples[i, 1:]:
                assert j not in neigh
        # negatives distinct within a row (sampling w/o replacement)
        for i in range(20):
            assert len(set(tuples[i, 1:])) == 5


class TestLoraGating:
    def test_svd_init_reconstructs_lowrank(self):
        rng = np.random.default_rng(7)
        base = (rng.normal(size=(20, 4)) @ rng.normal(size=(4, 8)))
        base = base.astype(np.float32)
        factors = svd_init(jnp.asarray(base), rank=4)
        recon = np.asarray(factors.a) @ np.asarray(factors.b)
        np.testing.assert_allclose(recon, base, atol=1e-3)

    def test_apply_lora(self):
        rng = np.random.default_rng(8)
        base = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
        f = svd_init(base, rank=2)
        out = apply_lora(base, f)
        ref = np.asarray(base) + np.asarray(f.a) @ np.asarray(f.b)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_learned_gate(self):
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
        b = jnp.zeros((1, 4))
        out = learned_gate(x, w, b)
        ref = np.asarray(x) * (1 / (1 + np.exp(-np.asarray(x @ w))))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_random_gate_bounded(self):
        x = jnp.ones((3, 4))
        out = random_gate(x, jax.random.key(0))
        assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)


class TestGAT:
    def test_shapes_and_mask(self):
        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
        adj = jnp.asarray(random_adj(rng, 6) + np.eye(6, dtype=np.float32))
        mask = jnp.asarray([True] * 5 + [False])
        model = DenseGAT(features=8, num_heads=2)
        params = model.init(jax.random.key(0), x, adj, mask)
        out = model.apply(params, x, adj, mask)
        assert out.shape == (6, 16)
        assert np.all(np.asarray(out)[5] == 0)


def test_avg_readout_mask():
    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]])
    mask = jnp.asarray([True, True, False])
    np.testing.assert_allclose(np.asarray(avg_readout(x, mask)),
                               [2.0, 3.0], atol=1e-6)


def test_preprompt_loss_runs_and_is_finite():
    rng = np.random.default_rng(11)
    n, f = 16, 6
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    raw = random_adj(rng, n)
    adj = jnp.asarray(raw + np.eye(n, dtype=np.float32))
    tuples = jnp.asarray(prompt_pretrain_sample(raw, 4, rng))
    model = PrePrompt(hidden=8, num_layers=1)
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)}, x, adj, tuples)
    loss = model.apply(params, x, adj, tuples,
                       rngs={"dropout": jax.random.key(2)})
    assert np.isfinite(float(loss))
    # inference path: deterministic embeddings
    h = model.apply(params, x, adj, method=model.inference)
    assert h.shape == (n, 8)


class TestOptionalPretrainLosses:
    def test_dgi_and_graphcl_losses(self):
        from ragraph_tpu.models.preprompt import corrupt_features
        rng = np.random.default_rng(12)
        n, f = 12, 6
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        raw = random_adj(rng, n)
        adj = jnp.asarray(raw + np.eye(n, dtype=np.float32))
        mask = jnp.asarray([True] * 10 + [False] * 2)
        model = PrePrompt(hidden=8, num_layers=1)
        params = model.init({"params": jax.random.key(0),
                             "dropout": jax.random.key(1)},
                            x, adj, jnp.zeros((n, 3), jnp.int32),
                            method=model.init_all)
        shuf = corrupt_features(jax.random.key(2), x, mask)
        # corruption keeps padded rows padded and permutes real rows
        assert np.allclose(np.asarray(shuf)[10:], np.asarray(x)[10:])
        assert not np.allclose(np.asarray(shuf)[:10], np.asarray(x)[:10])
        assert sorted(np.asarray(shuf)[:10, 0].tolist()) == \
            sorted(np.asarray(x)[:10, 0].tolist())

        dgi = model.apply(params, x, shuf, adj, mask,
                          method=model.dgi_loss)
        assert np.isfinite(float(dgi))
        a1 = jnp.asarray(random_adj(rng, n))
        a2 = jnp.asarray(random_adj(rng, n))
        gcl = model.apply(params, x, shuf, adj, a1, a2, mask,
                          method=model.graphcl_loss)
        assert np.isfinite(float(gcl))
        # gradients flow into the discriminator prompt params
        g = jax.grad(lambda p: model.apply(p, x, shuf, adj, mask,
                                           method=model.dgi_loss))(params)
        pnorm = float(jnp.abs(g["params"]["dgi"]["prompt"]).sum())
        assert pnorm > 0


class TestGraphCLFlavors:
    """All four GraphCL aug flavors wired into trainable losses
    (GraphCL.forward input wiring, models/graphcl.py:21-41)."""

    @pytest.mark.parametrize("flavor", ["edge", "mask", "node", "subgraph"])
    def test_loss_decreases(self, flavor):
        import optax
        from ragraph_tpu.models.preprompt import corrupt_features
        from ragraph_tpu.rag import make_graphcl_views

        rng = np.random.default_rng(21)
        n, f = 16, 6
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        raw = random_adj(rng, n)
        adj = jnp.asarray(raw + np.eye(n, dtype=np.float32))
        mask = jnp.asarray([True] * 14 + [False] * 2)

        model = PrePrompt(hidden=8, num_layers=1)
        params = model.init({"params": jax.random.key(0),
                             "dropout": jax.random.key(1)},
                            x, adj, jnp.zeros((n, 3), jnp.int32), mask,
                            method=model.init_all)
        opt = optax.adam(5e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, key):
            k_shuf, k_aug = jax.random.split(key)

            def loss_fn(p):
                shuf = corrupt_features(k_shuf, x, mask)
                v1, v2 = make_graphcl_views(k_aug, flavor, x, adj, mask)
                return model.apply(p, x, shuf, adj, v1, v2, mask,
                                   flavor=flavor,
                                   method=model.graphcl_flavor_loss)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for i in range(30):
            params, opt_state, loss = step(params, opt_state,
                                           jax.random.key(100 + i))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_mask_flavor_uses_its_own_head(self):
        """'mask' routes through the graphclmask head, others through
        graphcledge (preprompt.py:33-34 keeps two head instances)."""
        from ragraph_tpu.rag import make_graphcl_views
        rng = np.random.default_rng(22)
        n, f = 10, 4
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        adj = jnp.asarray(random_adj(rng, n) + np.eye(n, dtype=np.float32))
        model = PrePrompt(hidden=8, num_layers=1)
        params = model.init({"params": jax.random.key(0),
                             "dropout": jax.random.key(1)},
                            x, adj, jnp.zeros((n, 3), jnp.int32),
                            method=model.init_all)
        assert "graphcl_mask" in params["params"]

        def head_grad(flavor, head_name):
            def loss(p):
                v1, v2 = make_graphcl_views(jax.random.key(3), flavor, x,
                                            adj)
                return model.apply(p, x, x, adj, v1, v2, flavor=flavor,
                                   method=model.graphcl_flavor_loss)
            g = jax.grad(loss)(params)
            return float(jnp.abs(g["params"][head_name]["prompt"]).sum())

        assert head_grad("mask", "graphcl_mask") > 0
        assert head_grad("mask", "graphcl_edge") == 0
        assert head_grad("node", "graphcl_edge") > 0
        assert head_grad("node", "graphcl_mask") == 0
