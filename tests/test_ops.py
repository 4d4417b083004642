"""Golden-value unit tests for numeric ops vs NumPy reimplementations of
the reference math (SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from scipy.sparse.csgraph import floyd_warshall as scipy_fw

from ragraph_tpu.core.graph import normalize_adj_dense, row_normalize_adj
from ragraph_tpu.ops.pagerank import (degree_centrality_dense,
                                      inverse_sample_prob_dense,
                                      inverse_sample_prob_edges,
                                      pagerank_dense, pagerank_edges)
from ragraph_tpu.ops.propagation import (aggregate_k_hop_dense,
                                         aggregate_k_hop_edges)
from ragraph_tpu.ops.segment import segment_softmax
from ragraph_tpu.ops.shortest_path import (all_pairs_shortest_paths,
                                           anchor_distances,
                                           position_aware_codes)
from ragraph_tpu.ops.similarity import cosine_similarity
from ragraph_tpu.ops.topk import cosine_topk


def random_adj(rng, n, p=0.3):
    a = (rng.random((n, n)) < p).astype(np.float32)
    a = np.triu(a, 1)
    return a + a.T


def ref_normalize_adj(adj):
    """Reference scipy sym-norm (RAGraph_node/ragraph_utils/utility.py:19-26)."""
    adj = sp.coo_matrix(adj)
    rowsum = np.array(adj.sum(1))
    d_inv_sqrt = np.power(rowsum, -0.5).flatten()
    d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
    d = sp.diags(d_inv_sqrt)
    return adj.dot(d).transpose().dot(d).toarray()


class TestNormalize:
    def test_sym_norm_matches_reference(self):
        rng = np.random.default_rng(0)
        a = random_adj(rng, 17)
        ours = normalize_adj_dense(jnp.asarray(a), add_self_loops=True)
        ref = ref_normalize_adj(a + np.eye(17))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_padding_inert(self):
        rng = np.random.default_rng(1)
        a = random_adj(rng, 10)
        pad = np.zeros((16, 16), np.float32)
        pad[:10, :10] = a
        mask = np.arange(16) < 10
        ours = normalize_adj_dense(jnp.asarray(pad), jnp.asarray(mask))
        small = normalize_adj_dense(jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(ours)[:10, :10],
                                   np.asarray(small), atol=1e-6)
        assert np.all(np.asarray(ours)[10:] == 0)
        assert np.all(np.asarray(ours)[:, 10:] == 0)


class TestPropagation:
    def test_k_hop_matches_reference_math(self):
        """relu((A/deg) @ x) applied k times (Propagation.py:7-26)."""
        rng = np.random.default_rng(2)
        a = random_adj(rng, 12) + np.eye(12, dtype=np.float32)
        x = rng.normal(size=(12, 5)).astype(np.float32)
        k = 3
        ref = x.copy()
        a_n = a / a.sum(1, keepdims=True)
        for _ in range(k):
            ref = np.maximum(a_n @ ref, 0)
        ours = aggregate_k_hop_dense(jnp.asarray(a), jnp.asarray(x), k)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_edge_variant_matches_dense(self):
        rng = np.random.default_rng(3)
        a = random_adj(rng, 9) + np.eye(9, dtype=np.float32)
        x = rng.normal(size=(9, 4)).astype(np.float32)
        a_n = a / a.sum(1, keepdims=True)
        s, r = np.nonzero(a_n)
        w = a_n[s, r]
        # edge op aggregates into receivers: use (sender=col, receiver=row)
        ours = aggregate_k_hop_edges(jnp.asarray(r), jnp.asarray(s),
                                     jnp.asarray(w), jnp.asarray(x),
                                     num_nodes=9, k=2)
        dense = aggregate_k_hop_dense(jnp.asarray(a), jnp.asarray(x), 2)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(dense),
                                   atol=1e-5)


class TestPageRank:
    @staticmethod
    def ref_pagerank(adj, d=0.85, eps=1e-6):
        """Port of InverseSampling.pagerank_algorithm (:22-48)."""
        n = adj.shape[0]
        out_deg = adj.sum(1)
        zero = out_deg == 0
        out_deg[zero] = 1
        p_mat = adj / out_deg[:, None]
        p_mat[zero] = 1.0 / n
        p = np.ones(n) / n
        while True:
            new_p = (1 - d) / n + d * (p_mat.T @ p)
            if np.abs(new_p - p).sum() < eps:
                break
            p = new_p
        return p

    def test_matches_reference(self):
        rng = np.random.default_rng(4)
        a = random_adj(rng, 20)
        a[5] = 0  # dangling node
        a[:, 5] = 0
        ours = pagerank_dense(jnp.asarray(a))
        ref = self.ref_pagerank(a.astype(np.float64).copy())
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)

    def test_edges_matches_dense(self):
        rng = np.random.default_rng(5)
        a = random_adj(rng, 15)
        s, r = np.nonzero(a)
        ours = pagerank_edges(jnp.asarray(s.astype(np.int32)),
                              jnp.asarray(r.astype(np.int32)),
                              jnp.ones(len(s), bool), 15)
        dense = pagerank_dense(jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(ours), np.asarray(dense),
                                   atol=1e-4)

    def test_weighted_fractional_degrees_match_reference(self):
        """Production call sites pass binorm-WEIGHTED adjacencies whose
        row sums land in (0, 1); the reference divides by the raw
        out-degree (InverseSampling.py:29-31) — a max(deg, 1) clamp
        leaks probability mass on those rows."""
        rng = np.random.default_rng(7)
        a = random_adj(rng, 20)
        a[5] = 0
        a[:, 5] = 0
        # binorm weighting: row sums become fractional
        deg = np.maximum(a.sum(1), 1.0)
        w = a / np.sqrt(deg[:, None] * deg[None, :])
        assert ((w.sum(1) > 0) & (w.sum(1) < 1)).any()
        ref = self.ref_pagerank(w.astype(np.float64).copy())
        ours = pagerank_dense(jnp.asarray(w.astype(np.float32)))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)
        s, r = np.nonzero(w)
        edge_ours = pagerank_edges(jnp.asarray(s.astype(np.int32)),
                                   jnp.asarray(r.astype(np.int32)),
                                   jnp.asarray(w[s, r]), 20)
        np.testing.assert_allclose(np.asarray(edge_ours), ref, atol=1e-4)

    def test_inverse_prob_normalized_and_masked(self):
        rng = np.random.default_rng(6)
        a = np.zeros((24, 24), np.float32)
        a[:18, :18] = random_adj(rng, 18)
        mask = np.arange(24) < 18
        p = np.asarray(inverse_sample_prob_dense(jnp.asarray(a),
                                                 jnp.asarray(mask)))
        assert abs(p.sum() - 1.0) < 1e-5
        assert np.all(p[18:] == 0)
        # inverse importance: low-degree nodes get higher probability
        degs = a.sum(1)[:18]
        assert p[:18][degs.argmin()] > p[:18][degs.argmax()]

    def test_inverse_prob_edges(self):
        rng = np.random.default_rng(7)
        a = random_adj(rng, 12)
        s, r = np.nonzero(a)
        p = np.asarray(inverse_sample_prob_edges(
            jnp.asarray(s.astype(np.int32)), jnp.asarray(r.astype(np.int32)),
            jnp.ones(len(s), bool), 12))
        dense = np.asarray(inverse_sample_prob_dense(jnp.asarray(a)))
        np.testing.assert_allclose(p, dense, atol=1e-4)


class TestShortestPath:
    def test_apsp_matches_scipy(self):
        rng = np.random.default_rng(8)
        a = random_adj(rng, 14, p=0.2)
        ours = np.asarray(all_pairs_shortest_paths(jnp.asarray(a)))
        ref = scipy_fw(sp.csr_matrix(a), unweighted=True)
        finite = np.isfinite(ref)
        np.testing.assert_allclose(ours[finite], ref[finite], atol=1e-5)
        assert np.all(ours[~finite] >= 1e8)

    def test_anchor_distances_match_apsp(self):
        rng = np.random.default_rng(9)
        a = random_adj(rng, 14, p=0.25)
        anchors = jnp.asarray([0, 3, 7])
        d = np.asarray(anchor_distances(jnp.asarray(a), anchors,
                                        num_hops=10))
        full = scipy_fw(sp.csr_matrix(a), unweighted=True)
        for j, anc in enumerate([0, 3, 7]):
            ref = full[:, anc]
            reachable = np.isfinite(ref) & (ref <= 10)
            np.testing.assert_allclose(d[reachable, j], ref[reachable],
                                       atol=1e-5)

    def test_position_codes_range(self):
        rng = np.random.default_rng(10)
        a = random_adj(rng, 12, p=0.4)
        codes = np.asarray(position_aware_codes(
            jnp.asarray(a), jax.random.key(0), num_anchors=5, dis_q=10))
        assert codes.shape == (12, 5)
        assert np.all(codes >= 0) and np.all(codes <= 1)
        # each anchor column must contain a 1 (the anchor itself, d=0)
        assert np.all(codes.max(axis=0) == 1.0)


class TestSimilarityTopK:
    def test_cosine_matches_numpy(self):
        rng = np.random.default_rng(11)
        q = rng.normal(size=(6, 8)).astype(np.float32)
        k = rng.normal(size=(10, 8)).astype(np.float32)
        ours = np.asarray(cosine_similarity(jnp.asarray(q), jnp.asarray(k)))
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        kn = k / np.linalg.norm(k, axis=1, keepdims=True)
        np.testing.assert_allclose(ours, qn @ kn.T, atol=1e-5)

    def test_jaccard_matches_set_semantics(self):
        # Parity: SimilarityFunctions.calculate_jaccard_similarity
        # (reference:19-31) — the reference helper is unused and crashes
        # (torch.intersect1d doesn't exist), so the oracle is the intended
        # set semantics computed with numpy sets.
        from ragraph_tpu.ops.similarity import jaccard_similarity
        rng = np.random.default_rng(14)
        a = (rng.random((15, 15)) < 0.3).astype(np.float32)
        ours = np.asarray(jaccard_similarity(jnp.asarray(a)))
        for u in range(15):
            for v in range(15):
                nu, nv = set(np.nonzero(a[u])[0]), set(np.nonzero(a[v])[0])
                union = len(nu | nv)
                want = (len(nu & nv) / union) if union else 0.0
                assert abs(ours[u, v] - want) < 1e-6, (u, v)

    def test_jaccard_isolated_nodes_zero(self):
        from ragraph_tpu.ops.similarity import jaccard_similarity
        a = jnp.zeros((4, 4))
        assert np.all(np.asarray(jaccard_similarity(a)) == 0.0)

    def test_topk_matches_bruteforce(self):
        rng = np.random.default_rng(12)
        q = rng.normal(size=(5, 16)).astype(np.float32)
        keys = rng.normal(size=(40, 16)).astype(np.float32)
        scores, idx = cosine_topk(jnp.asarray(q), jnp.asarray(keys), 7)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        kn = keys / np.linalg.norm(keys, axis=1, keepdims=True)
        ref = np.argsort(-(qn @ kn.T), axis=1)[:, :7]
        np.testing.assert_array_equal(np.asarray(idx), ref)

    def test_topk_respects_valid_mask(self):
        rng = np.random.default_rng(13)
        q = rng.normal(size=(3, 4)).astype(np.float32)
        keys = rng.normal(size=(20, 4)).astype(np.float32)
        mask = jnp.arange(20) < 9
        _, idx = cosine_topk(jnp.asarray(q), jnp.asarray(keys), 5,
                             valid_mask=mask)
        assert np.all(np.asarray(idx) < 9)


class TestSegmentSoftmax:
    def test_matches_per_segment_softmax(self):
        logits = jnp.asarray([1.0, 2.0, 3.0, -1.0, 0.5])
        seg = jnp.asarray([0, 0, 1, 1, 1])
        out = np.asarray(segment_softmax(logits, seg, 2))
        ref0 = np.exp([1, 2]) / np.exp([1, 2]).sum()
        ref1 = np.exp([3, -1, 0.5]) / np.exp([3, -1, 0.5]).sum()
        np.testing.assert_allclose(out[:2], ref0, atol=1e-6)
        np.testing.assert_allclose(out[2:], ref1, atol=1e-6)

    def test_mask(self):
        logits = jnp.asarray([1.0, 2.0, 100.0])
        seg = jnp.asarray([0, 0, 0])
        mask = jnp.asarray([True, True, False])
        out = np.asarray(segment_softmax(logits, seg, 1, mask=mask))
        assert out[2] == 0
        np.testing.assert_allclose(out[:2].sum(), 1.0, atol=1e-6)
