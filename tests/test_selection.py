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
