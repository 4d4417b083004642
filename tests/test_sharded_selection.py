"""Distributed exact k-th selection + huge-k fusion on the 8-device
virtual CPU mesh: the sharded radix search must be BITWISE-equal to the
single-device op (integer psum counts), and the sharded fusion must
match the single-device huge-k branch of ``RAGraphEdge._fuse_rag``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragraph_tpu.ops.selection import rowwise_kth_largest
from ragraph_tpu.ops.similarity import l2_normalize
from ragraph_tpu.parallel import (make_mesh, shard_rows,
                                  sharded_huge_k_fuse, sharded_kth_largest)
from ragraph_tpu.parallel.mesh import replicate

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(dp=1, idx=8)


def _shard_cols(mesh, x):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.device_put(x, NamedSharding(mesh, P(None, "idx")))


class TestShardedKth:
    @pytest.mark.parametrize("k", [1, 7, 100, 512])
    def test_bitwise_equal(self, mesh8, k):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(16, 512)).astype(np.float32))
        ref = rowwise_kth_largest(x, k)
        got = sharded_kth_largest(mesh8, _shard_cols(mesh8, x), k)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_ties_and_negatives(self, mesh8):
        # bf16-rounded values force heavy ties; negatives exercise the
        # sign-flip key transform across the shard boundary
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
        x = x.astype(jnp.bfloat16).astype(jnp.float32) - 0.5
        for k in (3, 64, 255):
            ref = rowwise_kth_largest(x, k)
            got = sharded_kth_largest(mesh8, _shard_cols(mesh8, x), k)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_k_clamped_to_global_rows(self, mesh8):
        # k > R must clamp against the GLOBAL row count, not the shard's
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
        ref = rowwise_kth_largest(x, 64)  # row minimum
        got = sharded_kth_largest(mesh8, _shard_cols(mesh8, x), 10_000)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestShardedHugeKFuse:
    def _single_device_fuse(self, q, keys_n, values, k):
        # the exact math of RAGraphEdge._fuse_rag's huge-k branch
        scores = jnp.dot(l2_normalize(q).astype(keys_n.dtype), keys_n.T,
                         preferred_element_type=jnp.float32)
        kth = rowwise_kth_largest(scores, k)
        member = scores >= kth
        count = member.sum(axis=1, keepdims=True)
        s = jnp.dot(member.astype(values.dtype), values,
                    preferred_element_type=jnp.float32)
        return s / jnp.maximum(count, 1), count[:, 0]

    def test_matches_single_device(self, mesh8):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
        keys = jnp.asarray(rng.normal(size=(1024, 32)).astype(np.float32))
        values = jnp.asarray(rng.normal(size=(1024, 8)).astype(np.float32))
        keys_n = l2_normalize(keys)
        k = 200
        ref_mean, ref_count = self._single_device_fuse(q, keys_n, values, k)
        got_mean, got_count = sharded_huge_k_fuse(
            mesh8, replicate(mesh8, q), shard_rows(mesh8, keys_n),
            shard_rows(mesh8, values), k)
        # threshold + membership are exact -> counts identical; the mean
        # differs only by f32 psum reassociation
        np.testing.assert_array_equal(np.asarray(got_count),
                                      np.asarray(ref_count))
        np.testing.assert_allclose(np.asarray(got_mean),
                                   np.asarray(ref_mean), rtol=2e-6,
                                   atol=2e-6)

    def test_valid_mask_excludes_padding(self, mesh8):
        # padded rows (zero keys, huge values) must never contribute
        rng = np.random.default_rng(4)
        q = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
        keys = jnp.asarray(rng.normal(size=(200, 16)).astype(np.float32))
        values = jnp.asarray(rng.normal(size=(200, 4)).astype(np.float32))
        keys_n = l2_normalize(keys)
        pad = 56  # to 256 = 8 * 32
        keys_p = jnp.pad(keys_n, ((0, pad), (0, 0)))
        vals_p = jnp.pad(values, ((0, pad), (0, 0)),
                         constant_values=1e9)
        mask = jnp.arange(256) < 200
        k = 50
        ref_mean, ref_count = self._single_device_fuse(q, keys_n, values, k)
        got_mean, got_count = sharded_huge_k_fuse(
            mesh8, replicate(mesh8, q), shard_rows(mesh8, keys_p),
            shard_rows(mesh8, vals_p), k, valid_mask=shard_rows(mesh8, mask))
        np.testing.assert_array_equal(np.asarray(got_count),
                                      np.asarray(ref_count))
        np.testing.assert_allclose(np.asarray(got_mean),
                                   np.asarray(ref_mean), rtol=2e-6,
                                   atol=2e-6)

    def test_fewer_valid_than_k(self, mesh8):
        # k > valid rows: threshold bottoms out, mean = mean of all valid
        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
        keys = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
        values = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))
        keys_n = l2_normalize(keys)
        mask = jnp.arange(64) < 20
        got_mean, got_count = sharded_huge_k_fuse(
            mesh8, replicate(mesh8, q), shard_rows(mesh8, keys_n),
            shard_rows(mesh8, values), 50, valid_mask=shard_rows(mesh8, mask))
        assert np.all(np.asarray(got_count) == 20)
        np.testing.assert_allclose(
            np.asarray(got_mean),
            np.tile(np.asarray(values[:20]).mean(0), (3, 1)), rtol=2e-6,
            atol=2e-6)
