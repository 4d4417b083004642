"""Correctness of the streaming-prefix-sum sorted segment sum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragraph_tpu.ops.pallas_segment import sorted_segment_sum, streaming_cumsum

INTERPRET = jax.default_backend() == "cpu"


def test_streaming_cumsum_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1000, 8)).astype(np.float32)
    out = np.asarray(streaming_cumsum(jnp.asarray(x), block=128,
                                      interpret=INTERPRET))
    np.testing.assert_allclose(out, np.cumsum(x, axis=0), rtol=1e-4,
                               atol=1e-3)


@pytest.mark.parametrize("n_edges,n_segs", [(512, 64), (1000, 300)])
def test_sorted_segment_sum_matches_scatter(n_edges, n_segs):
    rng = np.random.default_rng(1)
    ids = np.sort(rng.integers(0, n_segs, n_edges)).astype(np.int32)
    msgs = rng.normal(size=(n_edges, 16)).astype(np.float32)
    indptr = np.zeros(n_segs + 1, np.int64)
    np.add.at(indptr[1:], ids, 1)
    indptr = np.cumsum(indptr).astype(np.int32)

    ours = np.asarray(sorted_segment_sum(
        jnp.asarray(msgs), jnp.asarray(indptr[:-1]), jnp.asarray(indptr[1:]),
        block=128, interpret=INTERPRET))
    ref = np.asarray(jax.ops.segment_sum(jnp.asarray(msgs),
                                         jnp.asarray(ids),
                                         num_segments=n_segs))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)
    # empty segments are exactly zero
    empty = np.setdiff1d(np.arange(n_segs), ids)
    if len(empty):
        assert np.all(ours[empty] == 0)
