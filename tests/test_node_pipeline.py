"""End-to-end node-classification pipeline test.

Mirrors the reference protocol (``RAGraph_node/finetune-rag.py``):
Lp-contrastive pretrain → library build from the train split → fine-tune on
the val split → append val entries to the library → test accuracy. Asserts
learning far above chance on planted-partition synthetic data.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import optax
import pytest

from ragraph_tpu.data import flat_batches, stacked_batches, synthetic_tu_dataset
from ragraph_tpu.models import (PrePrompt, RAGraphNode, RAGraphNodeConfig,
                                prompt_pretrain_sample)
from ragraph_tpu.rag import LibraryConfig

HID = 32


@pytest.fixture(scope="module")
def pipeline():
    rng = np.random.default_rng(42)
    ds = synthetic_tu_dataset(seed=0, num_graphs=60, num_classes=3,
                              feat_dim=16)
    train, val, test = ds.subset(0, .5), ds.subset(.5, .8), ds.subset(.8, 1)
    pad = 8 * max(g.features.shape[0] for g in ds.graphs)

    model = PrePrompt(hidden=HID, num_layers=1)
    g0 = next(flat_batches(train.graphs, 8, pad))
    params = model.init({"params": jr.key(0), "dropout": jr.key(1)},
                        g0.features, g0.adj, jnp.zeros((pad, 3), jnp.int32),
                        g0.node_mask)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def pre_step(params, opt_state, feats, adj, tuples, mask, key):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, feats, adj, tuples, mask,
                                  rngs={"dropout": key}))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for epoch in range(6):
        tot, nb = 0.0, 0
        for g in flat_batches(train.graphs, 8, pad):
            raw = np.asarray(g.adj) > 0
            np.fill_diagonal(raw, False)
            tuples = jnp.asarray(prompt_pretrain_sample(
                raw.astype(np.float32), 10, rng, np.asarray(g.node_mask)))
            params, opt_state, loss = pre_step(
                params, opt_state, g.features, g.adj, tuples, g.node_mask,
                jr.fold_in(jr.key(2), epoch * 100 + nb))
            tot += float(loss)
            nb += 1
        losses.append(tot / nb)
    return dict(ds=ds, train=train, val=val, test=test, pad=pad,
                enc_params=params, losses=losses)


def test_pretrain_loss_decreases(pipeline):
    assert np.isfinite(pipeline["losses"]).all()
    assert pipeline["losses"][-1] < pipeline["losses"][0]


def _make_task(pipeline, finetune, **lib_kwargs):
    libcfg = LibraryConfig(level="node", retrieve_num=4, toy_graph_hop=2,
                           **lib_kwargs)
    cfg = RAGraphNodeConfig(emb_size=HID, num_class=3, finetune=finetune,
                            library=libcfg)
    task = RAGraphNode(cfg, feature_dim=16)
    state = task.init_state(jr.key(3), encoder_params=pipeline["enc_params"],
                            library_capacity=4096)
    return task, state


def test_finetuned_accuracy_beats_chance(pipeline):
    task, state = _make_task(pipeline, finetune=True, num_inverse_sample=10,
                             num_augment_scale=3, use_positions=True)
    state = task.build_library(
        state, stacked_batches(pipeline["train"].graphs, 8), jr.key(4))
    assert int(state.library.fill) == 30 * 4 * 10  # graphs*copies*samples

    ft_opt = optax.adam(1e-2)
    tstep = task.make_train_step(ft_opt)
    fb = list(flat_batches(pipeline["val"].graphs, 8, pipeline["pad"]))
    opt_state = ft_opt.init({"encoder": state.encoder_params,
                             "decoder": state.decoder_params})
    first = last = None
    for epoch in range(8):
        tot = 0.0
        for i, g in enumerate(fb):
            state, opt_state, loss = tstep(
                state, opt_state, g, jr.fold_in(jr.key(5), epoch * 100 + i))
            tot += float(loss)
        if first is None:
            first = tot
        last = tot
    assert last < first  # fine-tune learns

    # reference protocol: val entries appended before test
    state = task.build_library(
        state, stacked_batches(pipeline["val"].graphs, 8), jr.key(6))
    acc = task.accuracy(state, flat_batches(pipeline["test"].graphs, 8,
                                            pipeline["pad"]))
    assert acc > 0.8, f"finetuned accuracy {acc} too low"


def test_training_free_accuracy_beats_chance(pipeline):
    task, state = _make_task(pipeline, finetune=False, num_inverse_sample=0,
                             num_augment_scale=0, use_positions=False)
    state = task.build_library(
        state, stacked_batches(pipeline["train"].graphs, 8), jr.key(7))
    acc = task.accuracy(state, flat_batches(pipeline["test"].graphs, 8,
                                            pipeline["pad"]))
    assert acc > 0.8, f"training-free accuracy {acc} too low"


def test_noise_finetune_forward(pipeline):
    """Adversarial noise retrieval path (noise only in training mode)."""
    libcfg = LibraryConfig(level="node", retrieve_num=4, toy_graph_hop=2,
                           num_inverse_sample=0, num_augment_scale=0,
                           use_positions=False, noise_mode="rows")
    cfg = RAGraphNodeConfig(emb_size=HID, num_class=3, noise_finetune=True,
                            library=libcfg)
    task = RAGraphNode(cfg, feature_dim=16)
    state = task.init_state(jr.key(8), encoder_params=pipeline["enc_params"],
                            library_capacity=4096)
    state = task.build_library(
        state, stacked_batches(pipeline["train"].graphs, 8), jr.key(9))
    g = next(flat_batches(pipeline["val"].graphs, 8, pipeline["pad"]))
    out_train = task.forward(state, g, training=True, key=jr.key(10))
    out_eval = task.forward(state, g)
    assert out_train.shape == out_eval.shape
    assert bool(jnp.isfinite(out_train).all())
