"""Tests for auxiliary subsystems: downprompt heads, GraphCL pretraining
augmentations, Planetoid helpers, checkpointing, logging, profiling."""

import os

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
import scipy.sparse as sp

from ragraph_tpu.data.planetoid import (adj_to_bias, micro_f1,
                                        row_normalize_features, sample_mask)
from ragraph_tpu.nn.prompts import (DownPrompt, DownstreamPrompt,
                                    WeightedFeature, WeightedPrompt,
                                    average_emb, distance_to_center, onehot,
                                    sum_pool_by_graph)
from ragraph_tpu.rag.pretrain_aug import (aug_drop_node, aug_random_edge,
                                          aug_random_mask, aug_subgraph)
from ragraph_tpu.train.checkpoint import (BestCheckpointKeeper,
                                          restore_checkpoint,
                                          save_checkpoint)
from ragraph_tpu.train.logging import RunLogger, log_exceptions
from ragraph_tpu.train.profiling import (assert_all_finite, phase,
                                         tree_all_finite)


def random_adj(rng, n, p=0.3):
    a = (rng.random((n, n)) < p).astype(np.float32)
    a = np.triu(a, 1)
    return a + a.T


class TestPrompts:
    def test_average_emb(self):
        emb = jnp.asarray([[1.0, 0], [3.0, 0], [0, 2.0]])
        labels = jnp.asarray([0, 0, 1])
        out = average_emb(emb, labels, 2)
        np.testing.assert_allclose(np.asarray(out), [[2, 0], [0, 2]],
                                   atol=1e-6)

    def test_downprompt_probabilities(self):
        rng = np.random.default_rng(0)
        seq = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
        centroids = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
        model = DownPrompt(hidden=8, num_classes=3)
        params = model.init(jr.key(0), seq, centroids)
        out = model.apply(params, seq, centroids)
        assert out.shape == (6, 3)
        np.testing.assert_allclose(np.asarray(out.sum(1)), 1.0, atol=1e-5)

    def test_weighted_prompt_init(self):
        model = WeightedPrompt(3)
        p = jnp.ones((3, 4))
        params = model.init(jr.key(0), p)
        w = params["params"]["weight"]
        np.testing.assert_allclose(np.asarray(w), [[0.9, 0.9, 0.1]],
                                   atol=1e-6)

    def test_weighted_feature_init_passthrough(self):
        model = WeightedFeature()
        a = jnp.ones((2, 3)) * 2
        b = jnp.ones((2, 3)) * 100
        params = model.init(jr.key(0), a, b)
        out = model.apply(params, a, b)
        # init (1, 0): elu(a)
        np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-6)

    def test_sum_pool_and_distance(self):
        feats = jnp.asarray([[1.0], [2.0], [3.0]])
        gid = jnp.asarray([0, 0, 1])
        pooled = sum_pool_by_graph(feats, gid, 2)
        np.testing.assert_allclose(np.asarray(pooled), [[3.0], [3.0]],
                                   atol=1e-6)
        d = distance_to_center(jnp.asarray([[0.0, 0.0]]),
                               jnp.asarray([[3.0, 4.0]]))
        np.testing.assert_allclose(np.asarray(d), [[25.0]], atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(onehot(jnp.asarray([1]), 3)), [[0, 1, 0]])


class TestPretrainAug:
    def test_random_mask_zeroes_rows(self):
        rng = np.random.default_rng(0)
        f = jnp.asarray(rng.normal(size=(50, 4)).astype(np.float32)) + 10
        out = np.asarray(aug_random_mask(jr.key(0), f, 0.3))
        zero_rows = (out == 0).all(axis=1).sum()
        assert 5 <= zero_rows <= 28  # ~30% of 50

    def test_random_edge_preserves_symmetry(self):
        rng = np.random.default_rng(1)
        a = random_adj(rng, 30)
        out = np.asarray(aug_random_edge(jr.key(1), jnp.asarray(a), 0.4))
        np.testing.assert_allclose(out, out.T, atol=1e-6)
        assert np.all(np.diag(out) == 0)
        assert not np.allclose(out, a)

    def test_drop_node_masks(self):
        rng = np.random.default_rng(2)
        a = random_adj(rng, 20)
        f = rng.normal(size=(20, 3)).astype(np.float32)
        f2, a2, mask = aug_drop_node(jr.key(2), jnp.asarray(f),
                                     jnp.asarray(a), 0.3)
        mask = np.asarray(mask)
        assert mask.sum() < 20
        assert np.all(np.asarray(f2)[~mask] == 0)
        assert np.all(np.asarray(a2)[~mask] == 0)

    def test_subgraph_connected_growth(self):
        rng = np.random.default_rng(3)
        a = random_adj(rng, 16, p=0.5)
        f = rng.normal(size=(16, 3)).astype(np.float32)
        f2, a2, member = aug_subgraph(jr.key(3), jnp.asarray(f),
                                      jnp.asarray(a), 0.25)
        member = np.asarray(member)
        # roughly (1 - 0.25) * 16 = 12 nodes (may stop early)
        assert 1 <= member.sum() <= 12
        # membership must be connected in a: every member (except one) has
        # a member neighbor
        sub = a[np.ix_(member.nonzero()[0], member.nonzero()[0])]
        if member.sum() > 1:
            assert (sub.sum(1) > 0).all()


class TestPlanetoidHelpers:
    def test_row_normalize(self):
        f = np.asarray([[1, 1, 2], [0, 0, 0]], np.float32)
        out = row_normalize_features(f)
        np.testing.assert_allclose(out[0].sum(), 1.0, atol=1e-6)
        assert np.all(out[1] == 0)

    def test_adj_to_bias(self):
        a = np.asarray([[0, 1], [1, 0]], np.float32)
        bias = adj_to_bias(a, nhood=1)
        np.testing.assert_allclose(bias, 0.0)  # fully connected with self
        a2 = np.zeros((2, 2), np.float32)
        bias2 = adj_to_bias(a2, nhood=1)
        assert bias2[0, 1] == -1e9 and bias2[0, 0] == 0

    def test_micro_f1_perfect(self):
        logits = np.asarray([[10.0, -10.0], [-10.0, 10.0]])
        labels = np.asarray([[1, 0], [0, 1]], np.float32)
        assert micro_f1(logits, labels) == 1.0

    def test_sample_mask(self):
        m = sample_mask([0, 2], 4)
        np.testing.assert_array_equal(m, [True, False, True, False])


class TestCheckpoint:
    def test_roundtrip_pickle(self, tmp_path):
        tree = {"a": jnp.ones((3, 2)), "b": {"c": jnp.arange(4)}}
        p = save_checkpoint(str(tmp_path / "ckpt"), tree, use_orbax=False)
        restored = restore_checkpoint(p, use_orbax=False)
        np.testing.assert_allclose(restored["a"], np.ones((3, 2)))
        np.testing.assert_array_equal(restored["b"]["c"], np.arange(4))

    def test_best_keeper(self, tmp_path):
        keeper = BestCheckpointKeeper(str(tmp_path))
        assert keeper.update(0.5, {"w": jnp.ones(2)})
        assert not keeper.update(0.3, {"w": jnp.zeros(2)})
        assert keeper.update(0.7, {"w": jnp.full((2,), 7.0)})
        best = restore_checkpoint(keeper.path, use_orbax=False)
        np.testing.assert_allclose(best["w"], 7.0)


class TestLoggingProfiling:
    def test_logger_writes_file(self, tmp_path):
        lg = RunLogger(save_dir=str(tmp_path), exp_name="t")
        lg.log_loss(0, {"rec_loss": 0.5})
        lg.log_eval({"recall": np.asarray([0.1])}, ks=(20,))
        content = open(lg.log_path).read()
        assert "rec_loss=0.50000" in content
        assert "recall@20=0.10000" in content

    def test_log_exceptions_reraises(self):
        @log_exceptions
        def boom():
            raise RuntimeError("x")
        with pytest.raises(RuntimeError):
            boom()

    def test_phase_timer(self):
        with phase("unit-test-phase"):
            _ = jnp.ones(4).sum()

    def test_finiteness(self):
        ok = {"a": jnp.ones(3), "n": jnp.arange(3)}
        assert bool(tree_all_finite(ok))
        bad = {"a": jnp.asarray([1.0, jnp.nan])}
        assert not bool(tree_all_finite(bad))
        with pytest.raises(ValueError):
            assert_all_finite(bad)


class TestFewshotExport:
    def test_sample_and_export_roundtrip(self, tmp_path):
        from ragraph_tpu.data.fewshot_export import (export_fewshot_splits,
                                                     load_fewshot_split,
                                                     sample_k_shot_nodes)
        from ragraph_tpu.data.synthetic import synthetic_tu_dataset
        ds = synthetic_tu_dataset(seed=5, num_graphs=20, num_classes=3,
                                  feat_dim=8)
        rng = np.random.default_rng(0)
        feats, labels, adj = sample_k_shot_nodes(ds, shots=5,
                                                 num_classes=3, rng=rng)
        assert feats.shape == (15, 8)
        assert sorted(np.bincount(labels, minlength=3).tolist()) == [5, 5, 5]
        np.testing.assert_allclose(adj, adj.T)

        paths = export_fewshot_splits(ds, str(tmp_path / "fs"), shots=3,
                                      num_tasks=2)
        f2, l2, a2 = load_fewshot_split(paths[0])
        assert f2.shape[0] == l2.shape[0] == a2.shape[0]


class TestExperimentConfig:
    def test_json_roundtrip(self, tmp_path):
        from ragraph_tpu.config import ExperimentConfig
        from ragraph_tpu.rag.library import LibraryConfig
        cfg = ExperimentConfig(
            task="edge", dataset="amazon", emb_size=64,
            library=LibraryConfig(level="graph", retrieve_num=3))
        path = str(tmp_path / "exp.json")
        cfg.to_json(path)
        back = ExperimentConfig.from_json(path)
        assert back == cfg
        assert back.library.level == "graph"
        assert back.edge.metrics == ("recall", "ndcg")

    def test_replace(self):
        from ragraph_tpu.config import ExperimentConfig
        cfg = ExperimentConfig().replace(lr=5e-4)
        assert cfg.lr == 5e-4


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from ragraph_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    tree = {"w": jnp.arange(6.0).reshape(2, 3), "b": {"x": jnp.ones(2)}}
    p = save_checkpoint(str(tmp_path / "ock"), tree, use_orbax=True)
    back = restore_checkpoint(p, template=tree, use_orbax=True)
    np.testing.assert_allclose(np.asarray(back["w"]),
                               np.arange(6.0).reshape(2, 3))


def test_torch_pt_importer_roundtrip(tmp_path):
    """VERDICT r2 #8: fabricate a reference-style state_dict, save with
    torch.save, and assert the importer recovers the tables bit-exactly
    (``RAGraph_edge/finetune_rag.py:80-95`` consumption format)."""
    torch = pytest.importorskip("torch")
    from ragraph_tpu.train import tables_from_torch

    rng = np.random.default_rng(0)
    u = rng.normal(size=(32, 8)).astype(np.float32)
    it = rng.normal(size=(64, 8)).astype(np.float32)
    sd = {"user_embedding": torch.from_numpy(u),
          "item_embedding": torch.from_numpy(it),
          "gating_weight": torch.zeros(8, 8)}  # extra keys ignored
    p = str(tmp_path / "GraphPro_pretrained.pt")
    torch.save(sd, p)
    tables = tables_from_torch(p)
    np.testing.assert_array_equal(tables["user_embedding"], u)
    np.testing.assert_array_equal(tables["item_embedding"], it)

    # nn.Embedding-style ".weight" suffix and wrapper-dict formats
    sd2 = {"state_dict": {"user_embedding.weight": torch.from_numpy(u),
                          "item_embedding.weight": torch.from_numpy(it)}}
    p2 = str(tmp_path / "wrapped.pt")
    torch.save(sd2, p2)
    tables2 = tables_from_torch(p2)
    np.testing.assert_array_equal(tables2["item_embedding"], it)

    with pytest.raises(KeyError):
        p3 = str(tmp_path / "bad.pt")
        torch.save({"encoder.w": torch.zeros(2, 2)}, p3)
        tables_from_torch(p3)


def test_pt_importer_drives_cli_finetune(tmp_path):
    """--pre-model-path foo.pt end-to-end through the edge finetune CLI."""
    torch = pytest.importorskip("torch")
    from ragraph_tpu.cli import edge as edge_cli
    from ragraph_tpu.data import load_edge_dataset, synthetic_edge_stream

    train, stages = synthetic_edge_stream(seed=0, num_users=64,
                                          num_items=128, num_stages=5)
    ds = load_edge_dataset(train, [(u, i) for (u, i, *_) in stages[0]])
    rng = np.random.default_rng(1)
    sd = {"user_embedding": torch.from_numpy(
              rng.normal(scale=0.1, size=(ds.num_users, 8))
              .astype(np.float32)),
          "item_embedding": torch.from_numpy(
              rng.normal(scale=0.1, size=(ds.num_items, 8))
              .astype(np.float32))}
    p = str(tmp_path / "pretrained.pt")
    torch.save(sd, p)
    result = edge_cli.main(
        ["finetune", "--data-path", "SYNTH", "--emb-size", "8",
         "--epochs", "1", "--batch-size", "128", "--model", "GraphPro",
         "--save-dir", str(tmp_path / "s"), "--pre-model-path", p])
    assert len(result.recalls) == 4
    assert all(np.isfinite(result.recalls))


def test_standardize_data():
    from ragraph_tpu.data.planetoid import standardize_data
    rng = np.random.default_rng(0)
    f = rng.normal(loc=5.0, scale=2.0, size=(100, 4)).astype(np.float32)
    mask = np.arange(100) < 60
    out = standardize_data(f, mask)
    np.testing.assert_allclose(out[mask].mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out[mask].std(0), 1.0, atol=1e-5)


class TestPrefetch:
    def test_order_preserved(self):
        from ragraph_tpu.train.prefetch import prefetch
        items = list(prefetch(iter(range(100)), depth=3))
        assert items == list(range(100))

    def test_exception_propagates(self):
        from ragraph_tpu.train.prefetch import prefetch

        def gen():
            yield 1
            raise ValueError("boom")

        it = prefetch(gen())
        assert next(it) == 1
        with pytest.raises(ValueError):
            list(it)
