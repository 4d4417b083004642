"""IVF index tests: kmeans, bucketing, search recall vs brute force."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from ragraph_tpu.ops.topk import cosine_topk
from ragraph_tpu.rag.ivf import build_ivf, ivf_search, kmeans
from ragraph_tpu.ops.similarity import l2_normalize


@pytest.fixture(scope="module")
def clustered_keys():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(16, 32)).astype(np.float32) * 3
    assign = rng.integers(0, 16, size=4096)
    keys = centers[assign] + rng.normal(size=(4096, 32)).astype(np.float32)
    return jnp.asarray(keys)


def test_kmeans_assignment_consistency(clustered_keys):
    keys_n = l2_normalize(clustered_keys)
    centroids, assignment = kmeans(keys_n, jr.key(0), 16, iters=15)
    assert centroids.shape == (16, 32)
    # each row's assigned centroid is its argmax-similarity centroid
    scores = np.asarray(keys_n @ centroids.T)
    np.testing.assert_array_equal(np.asarray(assignment),
                                  scores.argmax(1))


def test_bucketing_preserves_rows(clustered_keys):
    idx = build_ivf(clustered_keys, jr.key(0), num_clusters=16,
                    capacity=1024, iters=10)
    n_indexed = int(idx.valid.sum())
    assert n_indexed + int(idx.dropped) == clustered_keys.shape[0]
    # every indexed row id appears at most once
    ids = np.asarray(idx.row_ids)[np.asarray(idx.valid)]
    assert len(np.unique(ids)) == len(ids)


def test_search_recall_vs_bruteforce(clustered_keys):
    idx = build_ivf(clustered_keys, jr.key(0), num_clusters=16,
                    capacity=1024, iters=10)
    rng = np.random.default_rng(1)
    queries = clustered_keys[:64] + 0.05 * jnp.asarray(
        rng.normal(size=(64, 32)).astype(np.float32))
    _, ivf_ids = ivf_search(idx, queries, k=10, nprobe=4)
    _, exact_ids = cosine_topk(queries, clustered_keys, 10, method="exact")
    ivf_np, exact_np = np.asarray(ivf_ids), np.asarray(exact_ids)
    recall = np.mean([len(set(ivf_np[i]) & set(exact_np[i])) / 10
                      for i in range(64)])
    assert recall > 0.9, f"IVF recall {recall} too low"


def test_search_full_probe_is_near_exact(clustered_keys):
    """Probing every cluster must recover brute force (minus drops)."""
    idx = build_ivf(clustered_keys, jr.key(0), num_clusters=8,
                    capacity=2048, iters=10)
    assert int(idx.dropped) == 0
    rng = np.random.default_rng(2)
    queries = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    _, ivf_ids = ivf_search(idx, queries, k=5, nprobe=8)
    _, exact_ids = cosine_topk(queries, clustered_keys, 5, method="exact")
    assert np.mean(np.sort(np.asarray(ivf_ids), 1)
                   == np.sort(np.asarray(exact_ids), 1)) == 1.0
