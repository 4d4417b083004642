"""Unit tests for the toy-graph library: append compaction, retrieval
parity, noise modes, and the batched build."""

import jax
import jax.numpy as jnp
import numpy as np

from ragraph_tpu.ops.similarity import l2_normalize
from ragraph_tpu.rag.library import (LibraryConfig, build_entries_batch,
                                     library_append, library_init,
                                     library_reset, retrieve)


def test_append_compacts_valid_rows():
    lib = library_init(capacity=16, emb_size=4, num_classes=2, num_anchors=3)
    keys = jnp.arange(5 * 4, dtype=jnp.float32).reshape(5, 4)
    vals = keys + 100
    labels = jnp.ones((5, 2))
    pos = jnp.zeros((5, 3))
    valid = jnp.asarray([True, False, True, True, False])
    lib = library_append(lib, keys, vals, labels, pos, valid)
    assert int(lib.fill) == 3
    np.testing.assert_array_equal(np.asarray(lib.keys[:3]),
                                  np.asarray(keys[jnp.asarray([0, 2, 3])]))
    # second append continues after fill
    lib = library_append(lib, keys, vals, labels, pos, valid)
    assert int(lib.fill) == 6
    np.testing.assert_array_equal(np.asarray(lib.keys[3:6]),
                                  np.asarray(keys[jnp.asarray([0, 2, 3])]))


def test_append_overflow_clamps():
    lib = library_init(capacity=4, emb_size=2, num_classes=1, num_anchors=1)
    rows = jnp.ones((6, 2))
    lib = library_append(lib, rows, rows, jnp.ones((6, 1)), jnp.ones((6, 1)),
                         jnp.ones((6,), bool))
    assert int(lib.fill) == 4


def test_reset():
    lib = library_init(capacity=4, emb_size=2, num_classes=1, num_anchors=1)
    rows = jnp.ones((2, 2))
    lib = library_append(lib, rows, rows, jnp.ones((2, 1)), jnp.ones((2, 1)),
                         jnp.ones((2,), bool))
    assert int(library_reset(lib).fill) == 0


def test_retrieve_returns_nearest_rows():
    rng = np.random.default_rng(0)
    lib = library_init(capacity=64, emb_size=8, num_classes=3, num_anchors=2)
    keys = rng.normal(size=(40, 8)).astype(np.float32)
    values = rng.normal(size=(40, 8)).astype(np.float32)
    labels = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 40)]
    lib = library_append(lib, jnp.asarray(keys), jnp.asarray(values),
                         jnp.asarray(labels), jnp.zeros((40, 2)),
                         jnp.ones((40,), bool))
    cfg = LibraryConfig(retrieve_num=5)
    queries = keys[:6] + 0.01 * rng.normal(size=(6, 8)).astype(np.float32)
    emb, lab = retrieve(lib, jnp.asarray(queries), cfg)
    assert emb.shape == (6, 5, 8) and lab.shape == (6, 5, 3)
    # nearest neighbor of a slightly-perturbed key is the key itself
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    kn = keys / np.linalg.norm(keys, axis=1, keepdims=True)
    nn_idx = (qn @ kn.T).argmax(1)
    np.testing.assert_allclose(np.asarray(emb[:, 0]), values[nn_idx],
                               atol=1e-5)


def test_retrieve_ignores_unfilled_slots():
    lib = library_init(capacity=32, emb_size=4, num_classes=2, num_anchors=2)
    keys = jnp.asarray(np.eye(4, dtype=np.float32))
    lib = library_append(lib, keys, keys * 2, jnp.ones((4, 2)),
                         jnp.zeros((4, 2)), jnp.ones((4,), bool))
    cfg = LibraryConfig(retrieve_num=4)
    emb, _ = retrieve(lib, keys, cfg)
    # all retrieved rows must be one of the 4 live values
    flat = np.asarray(emb).reshape(-1, 4)
    live = np.asarray(keys * 2)
    for row in flat:
        assert min(np.abs(live - row).sum(axis=1)) < 1e-6


def test_noise_rows_mode_appends_rows():
    rng = np.random.default_rng(1)
    lib = library_init(capacity=32, emb_size=4, num_classes=2, num_anchors=2)
    keys = rng.normal(size=(20, 4)).astype(np.float32)
    lib = library_append(lib, jnp.asarray(keys), jnp.asarray(keys),
                         jnp.ones((20, 2)), jnp.zeros((20, 2)),
                         jnp.ones((20,), bool))
    cfg = LibraryConfig(retrieve_num=3, noise_retrieve_num=2,
                        noise_mode="rows")
    emb, lab = retrieve(lib, jnp.asarray(keys[:5]), cfg, add_noise=True,
                        key=jax.random.key(0))
    # node-variant: 2*retrieve_num retrieved + noise rows
    assert emb.shape == (5, 2 * 3 + 2, 4)
    assert lab.shape == (5, 2 * 3 + 2, 2)


def test_noise_gaussian_mode_perturbs():
    rng = np.random.default_rng(2)
    lib = library_init(capacity=16, emb_size=4, num_classes=2, num_anchors=2)
    keys = rng.normal(size=(10, 4)).astype(np.float32)
    lib = library_append(lib, jnp.asarray(keys), jnp.asarray(keys),
                         jnp.ones((10, 2)), jnp.zeros((10, 2)),
                         jnp.ones((10,), bool))
    cfg = LibraryConfig(retrieve_num=2, noise_mode="gaussian", noise_std=0.5)
    clean, _ = retrieve(lib, jnp.asarray(keys[:3]), cfg)
    noisy, _ = retrieve(lib, jnp.asarray(keys[:3]), cfg, add_noise=True,
                        key=jax.random.key(1))
    assert noisy.shape == (3, 4, 4)  # 2*retrieve_num under noise
    assert not np.allclose(np.asarray(noisy[:, :2]), np.asarray(clean))


def _dummy_encoder(features, adj, node_mask=None):
    return jnp.tanh(adj @ features)


def test_build_entries_batch_node_level():
    rng = np.random.default_rng(3)
    b, n, f, c = 3, 12, 6, 2
    feats = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
    adj = jnp.asarray((rng.random((b, n, n)) < 0.3).astype(np.float32))
    adj = (adj + jnp.transpose(adj, (0, 2, 1)) > 0).astype(jnp.float32)
    labels = jnp.asarray(np.eye(c, dtype=np.float32)[
        rng.integers(0, c, (b, n))])
    masks = jnp.ones((b, n), bool)
    gy = jnp.zeros((b, c))
    cfg = LibraryConfig(level="node", num_inverse_sample=4,
                        num_augment_scale=2, use_positions=True,
                        num_anchors=3, toy_graph_hop=1)
    keys, vals, labs, pos, valid = build_entries_batch(
        _dummy_encoder, feats, adj, labels, masks, gy, cfg,
        jax.random.key(0))
    rows = b * (1 + 2) * 4
    assert keys.shape == (rows, f)
    assert vals.shape == (rows, f)
    assert labs.shape == (rows, c)
    assert pos.shape == (rows, 3)
    assert bool(valid.all())
    # keys are L2-normalized (or exactly zero: the reference's augmentation
    # keeps nodes with prob sample_prob*0.01 ≈ 0, so augmented copies of a
    # bias-free dummy encoder collapse to zero rows — faithful behavior)
    norms = np.linalg.norm(np.asarray(keys), axis=1)
    assert np.all((np.abs(norms - 1.0) < 1e-4) | (norms < 1e-6))
    # the clean (first) copy of each graph is never degenerate
    norms_per = norms.reshape(b, 3, 4)
    np.testing.assert_allclose(norms_per[:, 0], 1.0, atol=1e-4)


def test_build_entries_batch_graph_level():
    rng = np.random.default_rng(4)
    b, n, f, c = 4, 10, 5, 3
    feats = jnp.asarray(rng.normal(size=(b, n, f)).astype(np.float32))
    adj = jnp.asarray((rng.random((b, n, n)) < 0.4).astype(np.float32))
    labels = jnp.zeros((b, n, c))
    masks = jnp.asarray(rng.random((b, n)) < 0.8)
    gy = jnp.asarray(np.eye(c, dtype=np.float32)[rng.integers(0, c, b)])
    cfg = LibraryConfig(level="graph", num_inverse_sample=0,
                        num_augment_scale=0, use_positions=False,
                        toy_graph_hop=0)
    keys, vals, labs, pos, valid = build_entries_batch(
        _dummy_encoder, feats, adj, labels, masks, gy, cfg,
        jax.random.key(0))
    assert keys.shape == (b, f)
    np.testing.assert_array_equal(np.asarray(labs), np.asarray(gy))
