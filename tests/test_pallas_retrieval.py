"""Correctness tests for the fused Pallas retrieval kernel (interpreter
mode on CPU; the same code compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragraph_tpu.ops.pallas_retrieval import fused_cosine_topk
from ragraph_tpu.ops.similarity import l2_normalize

INTERPRET = jax.default_backend() == "cpu"


def _exact(q, keys, k):
    scores = np.asarray(q, np.float32) @ np.asarray(keys, np.float32).T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


@pytest.mark.parametrize("q_len,r_len", [(16, 256), (100, 1000)])
def test_matches_bruteforce(q_len, r_len):
    rng = np.random.default_rng(0)
    q = l2_normalize(jnp.asarray(
        rng.normal(size=(q_len, 128)).astype(np.float32)))
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(r_len, 128)).astype(np.float32)))
    s, i = fused_cosine_topk(q, keys, 10, block_q=16, block_r=128,
                             interpret=INTERPRET)
    # bf16 scoring: compare against bf16-exact reference
    q16 = np.asarray(q.astype(jnp.bfloat16).astype(jnp.float32))
    k16 = np.asarray(keys.astype(jnp.bfloat16).astype(jnp.float32))
    ref_s, ref_i = _exact(q16, k16, 10)
    # indices can differ on near-ties; scores must match
    np.testing.assert_allclose(np.asarray(s), ref_s, atol=2e-2)
    match = (np.asarray(i) == ref_i).mean()
    assert match > 0.95, f"only {match:.2%} of indices match"


def test_valid_mask():
    rng = np.random.default_rng(1)
    q = l2_normalize(jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32)))
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(512, 64)).astype(np.float32)))
    mask = jnp.arange(512) < 200
    _, i = fused_cosine_topk(q, keys, 5, valid_mask=mask,
                             block_q=8, block_r=128, interpret=INTERPRET)
    assert np.all(np.asarray(i) < 200)


def test_sorted_descending():
    rng = np.random.default_rng(2)
    q = l2_normalize(jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32)))
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(256, 32)).astype(np.float32)))
    s, _ = fused_cosine_topk(q, keys, 8, block_q=8, block_r=128,
                             interpret=INTERPRET)
    s = np.asarray(s)
    assert np.all(np.diff(s, axis=1) <= 1e-6)


def test_padding_of_q_and_r():
    """Q/R not multiples of the block sizes still give exact results."""
    rng = np.random.default_rng(3)
    q = l2_normalize(jnp.asarray(rng.normal(size=(13, 32)).astype(np.float32)))
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(300, 32)).astype(np.float32)))
    s, i = fused_cosine_topk(q, keys, 4, block_q=8, block_r=128,
                             interpret=INTERPRET)
    assert s.shape == (13, 4) and i.shape == (13, 4)
    assert np.all(np.asarray(i) < 300)  # padding rows never retrieved


def test_rebuild_merge_matches_insert():
    rng = np.random.default_rng(4)
    q = l2_normalize(jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32)))
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(512, 64)).astype(np.float32)))
    s1, i1 = fused_cosine_topk(q, keys, 6, block_q=16, block_r=128,
                               interpret=INTERPRET, merge="insert")
    s2, i2 = fused_cosine_topk(q, keys, 6, block_q=16, block_r=128,
                               interpret=INTERPRET, merge="rebuild")
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
