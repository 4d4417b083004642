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

    def test_bf16_tier_bitwise_equal(self, mesh8):
        # a bf16 shard runs the native 16-bit search (6 psums); the
        # global threshold must still be bitwise the single-device bf16
        # op's
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(8, 512)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        for k in (1, 37, 500):
            ref = rowwise_kth_largest(x, k)
            got = sharded_kth_largest(mesh8, _shard_cols(mesh8, x), k)
            assert got.dtype == jnp.bfloat16
            np.testing.assert_array_equal(
                np.asarray(got.astype(jnp.float32)),
                np.asarray(ref.astype(jnp.float32)))

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

    def test_bf16_keys_select_bf16_tier(self, mesh8):
        """A bf16 key table engages the bf16 selection tier end-to-end:
        bf16 scores, 16-bit radix threshold, identical membership counts
        vs the single-device bf16 math."""
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
        keys = jnp.asarray(rng.normal(size=(512, 32)).astype(np.float32))
        values = jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32))
        keys_b = l2_normalize(keys).astype(jnp.bfloat16)
        k = 100
        # single-device twin of the model's bf16 branch
        scores = jnp.dot(l2_normalize(q).astype(jnp.bfloat16), keys_b.T,
                         preferred_element_type=jnp.bfloat16)
        kth = rowwise_kth_largest(scores, k)
        member = scores >= kth
        ref_count = member.sum(axis=1)
        ref_mean = (jnp.dot(member.astype(values.dtype), values,
                            preferred_element_type=jnp.float32)
                    / jnp.maximum(ref_count[:, None], 1))
        got_mean, got_count = sharded_huge_k_fuse(
            mesh8, replicate(mesh8, q), shard_rows(mesh8, keys_b),
            shard_rows(mesh8, values), k)
        assert int(got_count.min()) >= k  # bf16 ties only ever widen
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

    def test_fuse_rag_big_k_routes_through_sharded_fuse(self, mesh8,
                                                        monkeypatch):
        """`RAGraphEdge._fuse_rag`'s huge-k branch must take the
        idx-sharded fusion when the model carries a >1-idx mesh and the
        library rows divide the axis — and produce the same fused
        embeddings as the meshless model."""
        from ragraph_tpu.data.edgelist import load_edge_dataset
        from ragraph_tpu.data.synthetic import synthetic_edge_stream
        from ragraph_tpu.models.edge import (EdgeGraphArrays,
                                             EdgeModelConfig, RAGraphEdge)
        from ragraph_tpu.models.edge import ragraph_edge as re_mod
        from ragraph_tpu.parallel import sharded_selection as ss_mod

        train, stages = synthetic_edge_stream(seed=0, num_users=16,
                                              num_items=32, num_stages=1,
                                              interactions_per_user=4)
        ds = load_edge_dataset(train, [(u, i) for (u, i, _) in stages[0]],
                               num_users=16, num_items=32)
        g = EdgeGraphArrays.from_dataset(ds)
        e, k = 16, 8
        monkeypatch.setattr(re_mod, "_BIG_K_ELEMS", k * e - 1)
        calls = {"n": 0}
        real = ss_mod.sharded_huge_k_fuse

        def spy(*a, **kw):
            calls["n"] += 1
            return real(*a, **kw)

        monkeypatch.setattr(ss_mod, "sharded_huge_k_fuse", spy)

        rng = np.random.default_rng(6)
        res_keys = jnp.asarray(rng.normal(size=(64, e)), jnp.float32)
        res_vals = jnp.asarray(rng.normal(size=(64, e)), jnp.float32)
        q = jnp.asarray(rng.normal(size=(11, e)), jnp.float32)
        res_emb = jnp.zeros((11, e))
        cfg = EdgeModelConfig(emb_size=e, num_layers=2, retrieve_num=k,
                              rag_chunk=4, retrieve_weight=1.0)

        plain = RAGraphEdge(cfg, g, phase="vanilla")
        out_plain = np.asarray(plain._fuse_rag(
            q, res_emb, None, False, resources=(res_keys, res_vals)))
        assert calls["n"] == 0

        meshed = RAGraphEdge(cfg, g, phase="vanilla", mesh=mesh8)
        out_mesh = np.asarray(meshed._fuse_rag(
            q, res_emb, None, False, resources=(res_keys, res_vals)))
        assert calls["n"] > 0, "mesh model did not take the sharded fusion"
        np.testing.assert_allclose(out_mesh, out_plain, rtol=2e-6,
                                   atol=2e-6)

        # non-dividing library rows (65 % 8 != 0) must fall back cleanly
        calls["n"] = 0
        out_odd = np.asarray(meshed._fuse_rag(
            q, jnp.zeros((11, e)), None, False,
            resources=(jnp.pad(res_keys, ((0, 1), (0, 0)),
                               constant_values=1.0),
                       jnp.pad(res_vals, ((0, 1), (0, 0))))))
        assert calls["n"] == 0
        assert np.isfinite(out_odd).all()

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
