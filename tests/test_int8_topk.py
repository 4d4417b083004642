"""Int8 MXU scoring tier of ``ops.topk.cosine_topk`` (score_dtype/
rescore_pad) — correctness of the quantized path vs the f32 exact sort.

The speed claims live in experiments/int8_retrieval_bench.py (real chip);
these tests pin the *semantic* contract: high (not perfect) recall, exact
scores after rescore, mask safety, and the exactness-contract guards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragraph_tpu.ops.topk import cosine_topk
from ragraph_tpu.ops.similarity import l2_normalize

R, E, Q, K = 4096, 64, 128, 10


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    keys = jnp.asarray(rng.normal(size=(R, E)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(Q, E)).astype(np.float32))
    s_ex = jnp.dot(l2_normalize(queries), l2_normalize(keys).T,
                   preferred_element_type=jnp.float32)
    vals_ex, idx_ex = jax.lax.top_k(s_ex, K)
    return keys, queries, s_ex, vals_ex, idx_ex


def _recall(idx, idx_ex):
    return float((idx[:, :, None] == idx_ex[:, None, :]).any(-1).mean())


def test_int8_topk_recall(data):
    keys, queries, _, _, idx_ex = data
    _, idx = cosine_topk(queries, keys, K, score_dtype="int8")
    # quantization step 1/127 on unit rows: high but not perfect recall
    r = _recall(idx, idx_ex)
    assert r >= 0.9, r


def test_int8_rescore_improves_recall_and_scores_exact(data):
    keys, queries, s_ex, _, idx_ex = data
    _, idx_raw = cosine_topk(queries, keys, K, score_dtype="int8")
    vals, idx = cosine_topk(queries, keys, K, score_dtype="int8",
                            rescore_pad=22)
    assert _recall(idx, idx_ex) >= _recall(idx_raw, idx_ex)
    assert _recall(idx, idx_ex) >= 0.99
    # rescore recomputes the true (f32-keys) scores for its candidates
    got = jnp.take_along_axis(s_ex, idx, axis=1)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(got),
                               rtol=0, atol=1e-6)
    # and they come back sorted descending
    assert bool((jnp.diff(vals, axis=1) <= 1e-6).all())


def test_int8_valid_mask_respected(data):
    keys, queries, _, _, _ = data
    valid = jnp.arange(R) < R // 2
    for pad in (0, 22):
        _, idx = cosine_topk(queries, keys, K, valid_mask=valid,
                             score_dtype="int8", rescore_pad=pad)
        assert bool((idx < R // 2).all())


def test_int8_fewer_valid_than_candidates(data):
    """A query with < k + pad valid rows must mask, not hallucinate."""
    keys, queries, _, _, _ = data
    n_valid = K + 5                       # < K + rescore_pad
    valid = jnp.arange(R) < n_valid
    vals, idx = cosine_topk(queries, keys, K, valid_mask=valid,
                            score_dtype="int8", rescore_pad=22)
    assert bool((idx[:, :n_valid if n_valid < K else K] < n_valid).all())
    assert bool(jnp.isfinite(vals).all())  # K=10 < n_valid: all real


def test_int8_exactness_contract_guards(data):
    keys, queries, _, _, _ = data
    with pytest.raises(ValueError, match="exact-score contract"):
        cosine_topk(queries, keys, K, method="bucket", score_dtype="int8")
    with pytest.raises(ValueError, match="rescore_pad"):
        cosine_topk(queries, keys, K, rescore_pad=8)


def test_prequantized_keys_match_on_the_fly(data):
    """quantize_keys_i8 + int8 keys == float keys quantized per call."""
    from ragraph_tpu.ops.topk import quantize_keys_i8

    keys, queries, _, _, _ = data
    ki = quantize_keys_i8(keys)
    assert ki.dtype == jnp.int8
    v1, i1 = cosine_topk(queries, keys, K, score_dtype="int8")
    v2, i2 = cosine_topk(queries, ki, K, score_dtype="int8")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_int8_keys_guards(data):
    from ragraph_tpu.ops.topk import quantize_keys_i8

    keys, queries, _, _, _ = data
    ki = quantize_keys_i8(keys)
    with pytest.raises(ValueError, match="score_dtype='int8'"):
        cosine_topk(queries, ki, K)
    with pytest.raises(ValueError, match="full-precision rows"):
        cosine_topk(queries, ki, K, score_dtype="int8", rescore_pad=8)
    with pytest.raises(ValueError, match="rescore_keys"):
        cosine_topk(queries, keys, K, score_dtype="int8", rescore_pad=8,
                    rescore_keys=keys)  # float keys: quantize per call


def test_prequantized_rescore_matches_per_call(data):
    """The production serving tier — pre-quantized int8 scoring table +
    float rescore_keys — returns bitwise the same result as per-call
    quantization with rescore_pad (same candidates, same exact rescore).
    Reference semantic target: ToyGraphBase.retrieve's exact torch.topk
    (RAGraph_node/ragraph_utils/ToyGraphBase.py:66-71)."""
    from ragraph_tpu.ops.topk import quantize_keys_i8

    keys, queries, s_ex, _, idx_ex = data
    ki = quantize_keys_i8(keys)
    v1, i1 = cosine_topk(queries, keys, K, score_dtype="int8",
                         rescore_pad=22)
    v2, i2 = cosine_topk(queries, ki, K, score_dtype="int8",
                         rescore_pad=22, rescore_keys=keys)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    assert _recall(i2, idx_ex) >= 0.99
    # rescored scores are the true f32 scores of the returned rows
    picked = np.take_along_axis(np.asarray(s_ex), np.asarray(i2), axis=1)
    np.testing.assert_allclose(np.asarray(v2), picked, atol=1e-6)


def test_library_retrieve_dtype_wiring():
    """LibraryConfig(retrieve_dtype='int8') flows through retrieve()."""
    import dataclasses

    from ragraph_tpu.rag.library import (LibraryConfig, library_init,
                                         retrieve)

    rng = np.random.default_rng(3)
    cap, e, c = 512, 32, 3
    lib = library_init(cap, e, c, num_anchors=4)
    lib = dataclasses.replace(
        lib,
        keys=jnp.asarray(rng.normal(size=(cap + 1, e)), jnp.float32),
        values=jnp.asarray(rng.normal(size=(cap + 1, e)), jnp.float32),
        labels=jnp.asarray(np.eye(c, dtype=np.float32)[
            rng.integers(0, c, cap + 1)]),
        fill=jnp.asarray(cap, jnp.int32))
    q = jnp.asarray(rng.normal(size=(16, e)), jnp.float32)

    cfg = LibraryConfig(retrieve_num=4, use_positions=False)
    cfg8 = dataclasses.replace(cfg, retrieve_dtype="int8",
                               retrieve_rescore_pad=8)
    emb, lab = retrieve(lib, q, cfg)
    emb8, lab8 = retrieve(lib, q, cfg8)
    assert emb8.shape == emb.shape and lab8.shape == lab.shape
    # int8+rescore at this tiny scale should agree with the exact path
    # almost everywhere
    agree = float(jnp.isclose(emb8, emb).mean())
    assert agree >= 0.95, agree
