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


def _toy_graph(rng, n_nodes=96, n_edges=600):
    send = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    recv = np.sort(rng.integers(0, n_nodes, n_edges)).astype(np.int32)
    rip = np.concatenate(
        [[0], np.cumsum(np.bincount(recv, minlength=n_nodes))]).astype(np.int32)
    perm = np.argsort(send, kind="stable").astype(np.int32)
    sip = np.concatenate(
        [[0], np.cumsum(np.bincount(send, minlength=n_nodes))]).astype(np.int32)
    return send, recv, rip, perm, sip, recv[perm].astype(np.int32)


def test_gather_scale_segsum_forward_and_grad():
    """The fused propagation layer must match the plain XLA formulation in
    value AND in its emb-gradient (weights are AD constants by design)."""
    from ragraph_tpu.ops.pallas_segment import gather_scale_segsum

    rng = np.random.default_rng(7)
    n, d = 96, 16
    send, recv, rip, perm, sip, ros = _toy_graph(rng, n)
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.random(len(send)).astype(np.float32))
    w_send = w[jnp.asarray(perm)]

    def fused(e):
        out = gather_scale_segsum(e, w, w_send, jnp.asarray(send),
                                  jnp.asarray(rip), jnp.asarray(ros),
                                  jnp.asarray(sip), block=128, bf16=False,
                                  interpret=INTERPRET)
        return out, (out ** 2).sum()

    def ref(e):
        out = jax.ops.segment_sum(e[jnp.asarray(send)] * w[:, None],
                                  jnp.asarray(recv), num_segments=n)
        return out, (out ** 2).sum()

    out1, _ = fused(emb)
    out2, _ = ref(emb)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-4, atol=1e-4)
    g1 = jax.grad(lambda e: fused(e)[1])(emb)
    g2 = jax.grad(lambda e: ref(e)[1])(emb)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-3)


def test_gather_scale_segsum_bf16_close():
    from ragraph_tpu.ops.pallas_segment import gather_scale_segsum

    rng = np.random.default_rng(8)
    n, d = 64, 8
    send, recv, rip, perm, sip, ros = _toy_graph(rng, n, 400)
    emb = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.random(len(send)).astype(np.float32))
    out = gather_scale_segsum(emb, w, w[jnp.asarray(perm)],
                              jnp.asarray(send), jnp.asarray(rip),
                              jnp.asarray(ros), jnp.asarray(sip),
                              block=128, bf16=True, interpret=INTERPRET)
    ref = jax.ops.segment_sum(emb[jnp.asarray(send)] * w[:, None],
                              jnp.asarray(recv), num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_hash_edge_mask_order_consistent():
    from ragraph_tpu.models.edge.base import hash_edge_mask

    rng = np.random.default_rng(9)
    perm = jnp.asarray(rng.permutation(4096).astype(np.int32))
    key = jax.random.key(3)
    m = hash_edge_mask(key, jnp.arange(4096), 0.8)
    m_send = hash_edge_mask(key, perm, 0.8)
    np.testing.assert_array_equal(np.asarray(m)[np.asarray(perm)],
                                  np.asarray(m_send))
    keep = float(m.mean())
    assert 0.75 < keep < 0.85
    # different keys give different masks
    m2 = hash_edge_mask(jax.random.key(4), jnp.arange(4096), 0.8)
    assert bool((m != m2).any())


@pytest.mark.parametrize("n_edges,n_segs,block", [
    (512, 64, 128),      # n_edges exactly 2*block multiple, no pad
    (1000, 300, 128),    # pad path (1000 % 256 != 0)
    (700, 701, 128),     # many trailing empty segments (indptr == n runs)
])
def test_packed_w_segment_sum_matches_scatter(n_edges, n_segs, block):
    """The packed dual-half scan with in-triangle weighting must match
    segment_sum(msgs * w) including pad and trailing-empty-segment
    boundary cases (indptr == n replaced by the kernel's total output)."""
    from ragraph_tpu.ops.pallas_segment import sorted_segment_sum_packed_w

    rng = np.random.default_rng(11)
    ids = np.sort(rng.integers(0, max(1, n_segs - 40), n_edges)).astype(
        np.int32)
    msgs = rng.normal(size=(n_edges, 16)).astype(np.float32)
    w = rng.random(n_edges).astype(np.float32)
    indptr = np.zeros(n_segs + 1, np.int64)
    np.add.at(indptr[1:], ids, 1)
    indptr = np.cumsum(indptr).astype(np.int32)

    ours = np.asarray(sorted_segment_sum_packed_w(
        jnp.asarray(msgs), jnp.asarray(w), jnp.asarray(indptr),
        block=block, matmul_bf16=False, interpret=INTERPRET))
    ref = np.asarray(jax.ops.segment_sum(
        jnp.asarray(msgs * w[:, None]), jnp.asarray(ids),
        num_segments=n_segs))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)
    empty = np.setdiff1d(np.arange(n_segs), ids)
    if len(empty):
        assert np.all(ours[empty] == 0)


def test_packed_segment_sum_prescaled_matches():
    from ragraph_tpu.ops.pallas_segment import sorted_segment_sum_packed

    rng = np.random.default_rng(12)
    n_edges, n_segs = 900, 120
    ids = np.sort(rng.integers(0, n_segs, n_edges)).astype(np.int32)
    msgs = rng.normal(size=(n_edges, 16)).astype(np.float32)
    indptr = np.zeros(n_segs + 1, np.int64)
    np.add.at(indptr[1:], ids, 1)
    indptr = np.cumsum(indptr).astype(np.int32)

    ours = np.asarray(sorted_segment_sum_packed(
        jnp.asarray(msgs), jnp.asarray(indptr), block=128,
        matmul_bf16=False, interpret=INTERPRET))
    ref = np.asarray(jax.ops.segment_sum(jnp.asarray(msgs),
                                         jnp.asarray(ids),
                                         num_segments=n_segs))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_segsum_packed2_w_matches_scatter():
    """The packed-input scan entry point (msgs pre-packed to half-split
    (E/2, 2D) layout) must match segment_sum(msgs * w)."""
    from ragraph_tpu.ops.pallas_segment import _segsum_packed2_w

    rng = np.random.default_rng(13)
    n_edges, n_segs, d, block = 512, 96, 16, 128   # 512 % (2*128) == 0
    ids = np.sort(rng.integers(0, n_segs, n_edges)).astype(np.int32)
    msgs = rng.normal(size=(n_edges, d)).astype(np.float32)
    w = rng.random(n_edges).astype(np.float32)
    indptr = np.zeros(n_segs + 1, np.int64)
    np.add.at(indptr[1:], ids, 1)
    indptr = np.cumsum(indptr).astype(np.int32)

    # half-split pack: row c*B+i = [edge c*2B+i | edge c*2B+B+i]
    m3 = msgs.reshape(n_edges // (2 * block), 2, block, d)
    msgs2 = np.concatenate([m3[:, 0], m3[:, 1]], axis=2).reshape(
        n_edges // 2, 2 * d)
    ours = np.asarray(_segsum_packed2_w(
        jnp.asarray(msgs2), jnp.asarray(w), jnp.asarray(indptr),
        n_edges, block=block, matmul_bf16=False, interpret=INTERPRET))
    ref = np.asarray(jax.ops.segment_sum(
        jnp.asarray(msgs * w[:, None]), jnp.asarray(ids),
        num_segments=n_segs))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_sorted_path_weight_gradients():
    """Contract guard (CLAUDE.md): on the AD-safe ``impl='sorted'`` path,
    gradients must flow through the per-edge WEIGHTS (the fused path
    treats them as constants by design)."""
    from ragraph_tpu.models.edge.base import lightgcn_propagate

    rng = np.random.default_rng(17)
    n, d, e = 40, 8, 200
    send = rng.integers(0, n, e).astype(np.int32)
    recv = np.sort(rng.integers(0, n, e)).astype(np.int32)
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(recv, minlength=n))]).astype(np.int32)
    emb = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    w = jnp.asarray(rng.random(e).astype(np.float32))

    def loss_sorted(w):
        layers = lightgcn_propagate(emb, jnp.asarray(send),
                                    jnp.asarray(recv), w, n, 2,
                                    recv_indptr=jnp.asarray(indptr),
                                    impl="sorted", interpret=INTERPRET)
        return (sum(layers) ** 2).sum()

    def loss_ref(w):
        h = emb
        acc = emb
        for _ in range(2):
            h = jax.ops.segment_sum(h[jnp.asarray(send)] * w[:, None],
                                    jnp.asarray(recv), num_segments=n)
            acc = acc + h
        return (acc ** 2).sum()

    g1 = jax.grad(loss_sorted)(w)
    g2 = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-3)
