"""ops/selection.rowwise_kth_largest — exactness vs the sort."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragraph_tpu.ops.selection import rowwise_kth_largest


@pytest.mark.parametrize("k", [1, 7, 100, 512])
def test_matches_sort(k):
    rng = np.random.default_rng(k)
    x = jnp.asarray(rng.normal(size=(32, 512)).astype(np.float32))
    ref = jax.lax.top_k(x, k)[0][:, -1:]
    got = rowwise_kth_largest(x, k)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_ties_and_negatives():
    # heavy ties (quantized values) + all-negative rows: the k-th VALUE
    # must be bitwise the sort's, so `x >= kth` membership matches
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.round(rng.normal(size=(16, 256)) * 4) / 4
                    ).astype(jnp.float32) - 5.0
    for k in (1, 10, 128, 256):
        ref = jax.lax.top_k(x, k)[0][:, -1:]
        got = rowwise_kth_largest(x, k)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(x >= got),
                                      np.asarray(x >= ref))


def test_randomized_sweep():
    """Randomized shapes/k (incl. bf16 inputs and constant rows) — the
    radix search must match the sort everywhere."""
    rng = np.random.default_rng(42)
    for _ in range(20):
        q = int(rng.integers(1, 9))
        r = int(rng.integers(1, 400))
        k = int(rng.integers(1, r + 1))
        mode = rng.integers(0, 3)
        if mode == 0:
            x = rng.normal(size=(q, r)) * 10.0 ** float(rng.integers(-3, 4))
        elif mode == 1:
            x = rng.integers(-3, 3, size=(q, r)).astype(np.float64)
        else:
            x = np.full((q, r), float(rng.normal()))
        xj = jnp.asarray(x.astype(np.float32))
        ref = jax.lax.top_k(xj, k)[0][:, -1:]
        got = rowwise_kth_largest(xj, k)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=f"q={q} r={r} k={k} m={mode}")
        # bf16 input path (astype f32 inside)
        got16 = rowwise_kth_largest(xj.astype(jnp.bfloat16), k)
        ref16 = jax.lax.top_k(xj.astype(jnp.bfloat16).astype(jnp.float32),
                              k)[0][:, -1:]
        np.testing.assert_array_equal(np.asarray(got16), np.asarray(ref16))


@pytest.mark.parametrize("k", [1, 13, 128, 300])
def test_bf16_native_matches_sort(k):
    """A bf16 input runs the native 16-bit search and must return the
    exact bf16 k-th order statistic (= the f32 sort over the bf16
    values), in bf16, with tie membership matching the sort's."""
    rng = np.random.default_rng(k)
    x = jnp.asarray(rng.normal(size=(16, 300)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    got = rowwise_kth_largest(x, k)
    assert got.dtype == jnp.bfloat16
    ref = jax.lax.top_k(x.astype(jnp.float32), k)[0][:, -1:]
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)), np.asarray(ref))
    np.testing.assert_array_equal(
        np.asarray(x >= got), np.asarray(x.astype(jnp.float32) >= ref))


def test_bf16_heavy_ties_and_infs():
    rng = np.random.default_rng(3)
    # coarse quantization -> many exact bf16 ties at every threshold
    x = jnp.asarray(np.round(rng.normal(size=(8, 128)) * 2) / 2
                    ).astype(jnp.bfloat16)
    for k in (1, 64, 128):
        ref = jax.lax.top_k(x.astype(jnp.float32), k)[0][:, -1:]
        got = rowwise_kth_largest(x, k)
        np.testing.assert_array_equal(
            np.asarray(got.astype(jnp.float32)), np.asarray(ref))
    x = jnp.asarray([[1.0, -np.inf, 3.0, np.inf]]).astype(jnp.bfloat16)
    assert float(rowwise_kth_largest(x, 2)[0, 0]) == 3.0
    assert float(rowwise_kth_largest(x, 99)[0, 0]) == -np.inf


def test_infinities_and_clamping():
    x = jnp.asarray([[1.0, -jnp.inf, 3.0, jnp.inf],
                     [-1.0, -2.0, -3.0, -4.0]], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(rowwise_kth_largest(x, 2)).ravel(),
        np.asarray([3.0, -2.0], np.float32))
    # k beyond R clamps to the row minimum; k <= 0 clamps to the max
    np.testing.assert_array_equal(
        np.asarray(rowwise_kth_largest(x, 99)).ravel(),
        np.asarray([-np.inf, -4.0], np.float32))
    np.testing.assert_array_equal(
        np.asarray(rowwise_kth_largest(x, 0)).ravel(),
        np.asarray([np.inf, -1.0], np.float32))
