"""End-to-end tests for the graph-level and few-shot RAGraph adapters."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import optax
import pytest

from ragraph_tpu.data import stacked_batches, flat_batches, synthetic_tu_dataset
from ragraph_tpu.models import (FewshotSupportSet, PrePrompt, RAGraphFewshot,
                                RAGraphFewshotConfig, RAGraphGraph,
                                RAGraphGraphConfig, fewshot_library_config,
                                graph_library_config)
from ragraph_tpu.rag.fewshot import (FewShotBase, fewshot_mean_logits,
                                     fewshot_predict_labels,
                                     fewshot_predict_logits,
                                     fewshot_predict_loss)

HID = 32


@pytest.fixture(scope="module")
def data():
    ds = synthetic_tu_dataset(seed=1, num_graphs=60, num_classes=3,
                              feat_dim=16, p_in=0.6)
    return dict(ds=ds, train=ds.subset(0, .5), val=ds.subset(.5, .8),
                test=ds.subset(.8, 1))


class TestFewshotHelpers:
    def test_mean_logits(self):
        logits = jnp.asarray([[1., 0.], [3., 0.], [0., 2.]])
        labels = jnp.asarray([0, 0, 1])
        protos = fewshot_mean_logits(logits, labels, 2)
        np.testing.assert_allclose(np.asarray(protos),
                                   [[2., 0.], [0., 2.]], atol=1e-6)

    def test_predict_logits_and_labels(self):
        protos = jnp.asarray([[1., 0.], [0., 1.]])
        logits = jnp.asarray([[2., 0.1], [0.1, 5.]])
        scores = fewshot_predict_logits(protos, logits)
        assert scores.shape == (2, 2)
        labels = fewshot_predict_labels(protos, logits)
        np.testing.assert_array_equal(np.asarray(labels), [0, 1])

    def test_predict_loss_zero_at_gold(self):
        protos = jnp.asarray([[1., 0.], [0., 1.]])
        logits = protos
        loss = fewshot_predict_loss(protos, logits, jnp.asarray([0, 1]))
        assert float(loss) < 1e-10

    def test_fewshot_base(self):
        rng = np.random.default_rng(0)
        centers = np.eye(3, 4, dtype=np.float32) * 4
        labels_np = np.asarray([0, 0, 1, 1, 2, 2])
        sup = jnp.asarray(centers[labels_np]
                          + 0.1 * rng.normal(size=(6, 4)).astype(np.float32))
        labels = jnp.asarray(labels_np)
        fsb = FewShotBase(sup, labels, 3)
        out = fsb(sup, lambda x: x)  # identity decoder
        assert out.shape == (6, 3)
        # each support row's best class is its own
        np.testing.assert_array_equal(np.asarray(out.argmax(1)),
                                      np.asarray(labels))


class TestGraphPipeline:
    def test_graph_classification_beats_chance(self, data):
        libcfg = graph_library_config(3, retrieve_num=3)
        cfg = RAGraphGraphConfig(emb_size=HID, num_class=3,
                                 retrieve_weight=0.3, label_weight=0.3,
                                 library=libcfg)
        task = RAGraphGraph(cfg, feature_dim=16)
        state = task.init_state(jr.key(0), library_capacity=1024)
        state = task.build_library(
            state, stacked_batches(data["train"].graphs, 8), jr.key(1))
        assert int(state.library.fill) == 30  # one entry per graph

        opt = optax.adam(1e-2)
        tstep = task.make_train_step(opt)
        batches = list(stacked_batches(data["val"].graphs, 8))
        opt_state = opt.init({"encoder": state.encoder_params,
                              "decoder": state.decoder_params})
        first = last = None
        for epoch in range(10):
            tot = 0.0
            for i, b in enumerate(batches):
                state, opt_state, loss = tstep(state, opt_state, b,
                                               jr.fold_in(jr.key(2),
                                                          epoch * 50 + i))
                tot += float(loss)
            first = tot if first is None else first
            last = tot
        assert last < first

        state = task.build_library(
            state, stacked_batches(data["val"].graphs, 8), jr.key(3))
        acc = task.accuracy(state, stacked_batches(data["test"].graphs, 8))
        assert acc > 0.5, f"graph accuracy {acc} too low (chance 0.33)"

    def test_training_free_graph(self, data):
        libcfg = graph_library_config(3, retrieve_num=3)
        cfg = RAGraphGraphConfig(emb_size=HID, num_class=3, finetune=False,
                                 library=libcfg)
        task = RAGraphGraph(cfg, feature_dim=16)
        state = task.init_state(jr.key(4), library_capacity=1024)
        state = task.build_library(
            state, stacked_batches(data["train"].graphs, 8), jr.key(5))
        acc = task.accuracy(state, stacked_batches(data["test"].graphs, 8))
        assert acc > 0.5, f"training-free graph accuracy {acc} too low"

    def test_gaussian_noise_training_path(self, data):
        libcfg = graph_library_config(3, retrieve_num=3)
        cfg = RAGraphGraphConfig(emb_size=HID, num_class=3,
                                 noise_finetune=True, library=libcfg)
        task = RAGraphGraph(cfg, feature_dim=16)
        state = task.init_state(jr.key(6), library_capacity=1024)
        state = task.build_library(
            state, stacked_batches(data["train"].graphs, 8), jr.key(7))
        b = next(iter(stacked_batches(data["val"].graphs, 8)))
        out = task.forward(state, b, training=True, key=jr.key(8))
        assert bool(jnp.isfinite(out).all())


def _support_set(data, shots=5):
    """Build a k-shot support set from the first train graphs."""
    feats, labels = [], []
    per_class = {0: 0, 1: 0, 2: 0}
    for g in data["train"].graphs:
        y = g.node_labels.argmax(1)
        for i in range(g.features.shape[0]):
            if per_class[int(y[i])] < shots:
                per_class[int(y[i])] += 1
                feats.append(g.features[i])
                labels.append(int(y[i]))
    feats = np.stack(feats)
    s = len(feats)
    return FewshotSupportSet(
        features=jnp.asarray(feats),
        adj=jnp.eye(s),
        labels=jnp.asarray(labels, dtype=jnp.int32),
    )


class TestFewshotPipeline:
    def test_node_fewshot_beats_chance(self, data):
        libcfg = fewshot_library_config(retrieve_num=4, num_inverse_sample=0,
                                        num_augment_scale=0,
                                        structure_weight=0.001)
        cfg = RAGraphFewshotConfig(emb_size=HID, num_class=3,
                                   encoder_layers=2, library=libcfg)
        task = RAGraphFewshot(cfg, feature_dim=16)
        support = _support_set(data)
        state = task.init_state(jr.key(0), support, library_capacity=4096)
        state = task.build_library(
            state, stacked_batches(data["train"].graphs, 8), jr.key(1))
        assert int(state.library.fill) > 0

        pad = 8 * max(g.features.shape[0] for g in data["ds"].graphs)
        opt = optax.adam(1e-3)
        tstep = task.make_train_step_node(opt)
        opt_state = opt.init(state.encoder_params)
        batches = list(flat_batches(data["val"].graphs, 8, pad))
        first = last = None
        for epoch in range(5):
            tot = 0.0
            for i, g in enumerate(batches):
                state, opt_state, loss = tstep(state, opt_state, g,
                                               jr.fold_in(jr.key(2),
                                                          epoch * 50 + i))
                tot += float(loss)
            first = tot if first is None else first
            last = tot
        assert np.isfinite(last)

        acc = task.accuracy_node(state,
                                 flat_batches(data["test"].graphs, 8, pad))
        assert acc > 0.5, f"fewshot node accuracy {acc} too low (chance .33)"

    def test_graph_fewshot_forward(self, data):
        libcfg = fewshot_library_config(retrieve_num=3, num_inverse_sample=0,
                                        num_augment_scale=0,
                                        structure_weight=0.0,
                                        use_positions=False)
        cfg = RAGraphFewshotConfig(emb_size=HID, num_class=3, level="graph",
                                   query_graph_hop=1, encoder_layers=2,
                                   finetune=False, library=libcfg)
        task = RAGraphFewshot(cfg, feature_dim=16)
        # strong-signal dataset: the encoder is untrained here, so the test
        # isolates the retrieval + prototype-mapping machinery
        ds = synthetic_tu_dataset(seed=2, num_graphs=60, num_classes=3,
                                  feat_dim=16, p_in=0.8, p_out=0.02,
                                  signal=4.0)
        data = dict(ds=ds, train=ds.subset(0, .5), test=ds.subset(.8, 1))
        support = _support_set(data)
        state = task.init_state(jr.key(3), support, library_capacity=4096)
        state = task.build_library(
            state, stacked_batches(data["train"].graphs, 8), jr.key(4))
        # training-free path: retrieval + prototype mapping only (the
        # finetuned path is covered at node level with a trained encoder)
        out = task.forward_graph(
            state, next(iter(stacked_batches(data["test"].graphs, 8))))
        assert out.shape == (8, HID)
        assert bool(jnp.isfinite(out).all())
        acc = task.accuracy_graph(state,
                                  stacked_batches(data["test"].graphs, 8))
        assert acc > 0.33, f"fewshot graph accuracy {acc} at/below chance"


def test_graph_fewshot_train_step(data):
    """Graph-level fewshot fine-tune: one step runs and reduces loss on a
    repeated batch."""
    libcfg = fewshot_library_config(retrieve_num=3, num_inverse_sample=0,
                                    num_augment_scale=0,
                                    structure_weight=0.0,
                                    use_positions=False)
    cfg = RAGraphFewshotConfig(emb_size=HID, num_class=3, level="graph",
                               query_graph_hop=1, encoder_layers=2,
                               library=libcfg)
    task = RAGraphFewshot(cfg, feature_dim=16)
    support = _support_set(data)
    state = task.init_state(jr.key(9), support, library_capacity=4096)
    state = task.build_library(
        state, stacked_batches(data["train"].graphs, 8), jr.key(10))
    batch = next(iter(stacked_batches(data["val"].graphs, 8)))
    opt = optax.adam(1e-3)
    tstep = task.make_train_step_graph(opt)
    opt_state = opt.init(state.encoder_params)
    losses = []
    for i in range(5):
        state, opt_state, loss = tstep(state, opt_state, batch,
                                       jr.fold_in(jr.key(11), i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


class TestGraphSupportSets:
    """Graph-level support sets: whole graphs + per-graph mean-pooled
    prototypes (``RAGraph_graph_fewshot/finetune-rag.py:62-76``)."""

    def test_sample_k_shot_graphs_layout(self, data):
        from ragraph_tpu.data import sample_k_shot_graphs
        rng = np.random.default_rng(0)
        feats, adj, labels, lens = sample_k_shot_graphs(data["ds"], 4, 3,
                                                        rng)
        n = feats.shape[0]
        assert int(lens.sum()) == n
        assert adj.shape == (n, n)
        assert labels.shape == lens.shape
        assert set(np.unique(labels)) <= {0, 1, 2}
        # 4 graphs sampled per class (SYNTH has >=4 per class)
        for c in range(3):
            assert int((labels == c).sum()) == 4
        # symmetric normalization of blockdiag+I: sym, zero off-block
        assert np.allclose(adj, adj.T, atol=1e-6)
        off = int(lens[0])
        assert np.all(adj[:off, off:] == 0.0)
        # self-loop weights present (A+I before normalization)
        assert np.all(np.diag(adj) > 0.0)

    def test_prototypes_graph_segment_mean(self, data):
        """prototypes() with graph_ids == manual per-graph mean →
        per-class mean of encoder node logits."""
        from ragraph_tpu.data import sample_k_shot_graphs
        rng = np.random.default_rng(1)
        feats, adj, labels, lens = sample_k_shot_graphs(data["ds"], 3, 3,
                                                        rng)
        gids = np.repeat(np.arange(len(lens)), lens)
        cfg = RAGraphFewshotConfig(emb_size=HID, num_class=3,
                                   level="graph", encoder_layers=2)
        task = RAGraphFewshot(cfg, feature_dim=16)
        support = FewshotSupportSet(
            features=jnp.asarray(feats), adj=jnp.asarray(adj),
            labels=jnp.asarray(labels, dtype=jnp.int32),
            graph_ids=jnp.asarray(gids, dtype=jnp.int32))
        state = task.init_state(jr.key(3), support, library_capacity=256)
        protos = np.asarray(task.prototypes(state.encoder_params, support))
        assert protos.shape == (3, HID)

        node_logits = np.asarray(task.encoder.apply(
            state.encoder_params, support.features, support.adj,
            method=task.encoder.inference))
        graph_logits = np.stack([node_logits[gids == g].mean(0)
                                 for g in range(len(lens))])
        manual = np.stack([graph_logits[labels == c].mean(0)
                           for c in range(3)])
        np.testing.assert_allclose(protos, manual, rtol=1e-5, atol=1e-5)

    def test_export_and_load_graph_split(self, data, tmp_path):
        from ragraph_tpu.data.fewshot_export import (
            export_fewshot_graph_split)
        path = export_fewshot_graph_split(data["ds"],
                                          str(tmp_path / "support.npz"),
                                          shots=3, seed=0)
        d = np.load(path)
        assert set(d.files) == {"features", "adj", "labels", "graph_len"}
        assert int(d["graph_len"].sum()) == d["features"].shape[0]
