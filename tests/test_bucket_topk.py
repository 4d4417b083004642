"""Correctness of the two-phase exact bucket top-k (interpret mode on
CPU; same code compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragraph_tpu.ops.bucket_topk import bucketed_exact_topk, iterative_topk
from ragraph_tpu.ops.similarity import l2_normalize

INTERPRET = jax.default_backend() == "cpu"


def _ref(q, keys, k, valid=None):
    """The computation the kernel must match bitwise: bf16-input,
    f32-accumulate scores + full top-k."""
    scores = np.asarray(
        jnp.dot(q.astype(jnp.bfloat16), keys.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32))
    if valid is not None:
        scores = np.where(np.asarray(valid)[None, :], scores, -np.inf)
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


TOL = 3e-7  # ~2 f32 ULP: CPU BLAS accumulates different matmul shapes in
# different orders, so interpret-mode scores can differ in the last bit;
# on the MXU both paths accumulate identically (asserted bitwise by
# benchmarks/bench_pallas_topk.py on TPU).


def _check(q, keys, k, valid=None, **kw):
    s, i = bucketed_exact_topk(q, keys, k, valid_mask=valid,
                               interpret=INTERPRET, **kw)
    ref_s, ref_i = _ref(q, keys, k, valid)
    s, i = np.asarray(s), np.asarray(i)
    np.testing.assert_allclose(s, ref_s, atol=TOL, rtol=0)
    # indices may swap only across <=1-ULP score differences
    mism = i != ref_i
    if mism.any():
        assert np.abs(s[mism] - ref_s[mism]).max() <= TOL


def test_iterative_topk_matches_sort():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 640)).astype(np.float32))
    v, i = iterative_topk(x, 7)
    v_ref, i_ref = jax.lax.top_k(x, 7)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


@pytest.mark.parametrize("q_len,r_len", [(32, 2048), (100, 4000)])
def test_exact_vs_sort(q_len, r_len):
    rng = np.random.default_rng(1)
    q = l2_normalize(jnp.asarray(
        rng.normal(size=(q_len, 64)).astype(np.float32)))
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(r_len, 64)).astype(np.float32)))
    _check(q, keys, 10, block_q=32, block_r=512)


def test_valid_mask():
    rng = np.random.default_rng(2)
    q = l2_normalize(jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32)))
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(2048, 32)).astype(np.float32)))
    valid = jnp.arange(2048) < 700
    s, i = bucketed_exact_topk(q, keys, 5, valid_mask=valid,
                               interpret=INTERPRET, block_q=16,
                               block_r=512)
    assert np.all(np.asarray(i) < 700)
    ref_s, ref_i = _ref(q, keys, 5, valid)
    np.testing.assert_allclose(np.asarray(s), ref_s, atol=TOL, rtol=0)


def test_overflow_fallback_identical_queries():
    """All queries identical -> every query picks the same buckets ->
    massive per-bucket overflow; the cond fallback must keep it exact."""
    rng = np.random.default_rng(3)
    one = rng.normal(size=(1, 32)).astype(np.float32)
    q = l2_normalize(jnp.asarray(np.repeat(one, 64, axis=0)))
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(2048, 32)).astype(np.float32)))
    _check(q, keys, 6, block_q=32, block_r=512, p_max=4)


def test_fewer_nonempty_buckets_than_k():
    """256 rows pad to a 2048-row block -> only 2 of 16 buckets are
    non-empty; exhausted bucket slots must not duplicate bucket 0
    (regression: the sharded local-shard case)."""
    rng = np.random.default_rng(9)
    q = l2_normalize(jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32)))
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(256, 64)).astype(np.float32)))
    s, i = bucketed_exact_topk(q, keys, 8, interpret=INTERPRET)
    ref_s, ref_i = _ref(q, keys, 8)
    np.testing.assert_allclose(np.asarray(s), ref_s, atol=TOL, rtol=0)
    # no duplicated indices within a row
    i = np.asarray(i)
    assert all(len(set(row)) == len(row) for row in i)


def test_small_library_delegates():
    rng = np.random.default_rng(4)
    q = l2_normalize(jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)))
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(200, 16)).astype(np.float32)))
    # r_pad -> 512 -> 4 buckets > k? choose k high enough to hit delegate
    s, i = bucketed_exact_topk(q, keys, 10, interpret=INTERPRET,
                               block_q=8, block_r=512)
    ref_s, ref_i = _ref(q, keys, 10, jnp.arange(200) < 200)
    # padding rows are masked invalid internally
    assert np.all(np.asarray(i)[:, 0] < 200)
    np.testing.assert_allclose(np.asarray(s), ref_s, atol=TOL, rtol=0)


def test_unpadded_shapes():
    rng = np.random.default_rng(5)
    q = l2_normalize(jnp.asarray(rng.normal(size=(13, 48)).astype(np.float32)))
    keys = l2_normalize(jnp.asarray(
        rng.normal(size=(3000, 48)).astype(np.float32)))
    s, i = bucketed_exact_topk(q, keys, 4, interpret=INTERPRET,
                               block_q=8, block_r=512)
    ref_s, ref_i = _ref(q, keys, 4, jnp.arange(3000) < 3000)
    assert s.shape == (13, 4)
    assert np.all(np.asarray(i) < 3000)
    np.testing.assert_allclose(np.asarray(s), ref_s, atol=TOL, rtol=0)


def test_column_and_row_topk_kernels():
    """The Pallas k-extraction kernels must match iterative_topk exactly,
    including tie resolution (lowest index) and padding."""
    import jax
    from ragraph_tpu.ops.bucket_topk import (column_topk, iterative_topk,
                                             row_topk)

    interp = jax.default_backend() == "cpu"
    rng = np.random.default_rng(5)
    # deliberately introduce ties via a coarse grid of values
    x = rng.integers(0, 7, size=(300, 130)).astype(np.float32)
    k = 4

    vr, ir = iterative_topk(jnp.asarray(x.T.copy()), k)
    vc, ic = column_topk(jnp.asarray(x), k, block_q=128, interpret=interp)
    np.testing.assert_array_equal(np.asarray(vc), np.asarray(vr))
    np.testing.assert_array_equal(np.asarray(ic), np.asarray(ir))

    y = rng.integers(0, 7, size=(70, 260)).astype(np.float32)
    vr2, ir2 = iterative_topk(jnp.asarray(y), k)
    vw, iw = row_topk(jnp.asarray(y), k, block_q=64, interpret=interp)
    np.testing.assert_array_equal(np.asarray(vw), np.asarray(vr2))
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ir2))
