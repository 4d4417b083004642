"""IVF-style coarse-quantized retrieval index (TPU-native ANN).

North-star comparison partner for the brute-force blocked-matmul index
(BASELINE.md: "10M-vector sharded library: blocked-matmul top-k vs
IVF-style coarse index at equal recall@10").

TPU-native design (static shapes everywhere, HBM-frugal):

- **Build**: Lloyd k-means over L2-normalized keys — assignment is a
  bf16 matmul + argmax chunked over rows; the centroid update accumulates
  per-chunk segment-sums in f32 (the only f32 state is ``(P, E)``);
  rows are then bucketed into a dense ``(P, cap, E)`` tensor (input
  dtype, typically bf16) with a fixed per-cluster capacity — overflow
  rows are dropped and counted (reported, never silent).
- **Query**: score queries against the ``(P, E)`` centroids (MXU), take
  the top-``nprobe`` clusters, gather their buckets, score the
  ``nprobe·cap`` candidates, top-k. All gathers are fixed-shape; invalid
  slots carry ``-inf``.

This trades exactness for a ``nprobe·cap / R`` fraction of the scoring
FLOPs — on TPU the brute-force matmul is already so fast that IVF only
wins for very large R or tight latency budgets; the benchmark
(``benchmarks/bench_10m_index.py``) quantifies exactly that.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ragraph_tpu.core.graph import _pytree_dataclass
from ragraph_tpu.ops.similarity import l2_normalize


@_pytree_dataclass(meta_fields=("num_clusters", "capacity"))
class IVFIndex:
    centroids: jax.Array      # (P, E) L2-normalized f32
    keys: jax.Array           # (P, cap, E) bucketed normalized keys
    row_ids: jax.Array        # (P, cap) int32 original row ids (-1 empty)
    valid: jax.Array          # (P, cap) bool
    dropped: jax.Array        # scalar int32 — overflow rows not indexed
    num_clusters: int
    capacity: int


@partial(jax.jit, static_argnames=("num_clusters", "iters", "chunk"))
def kmeans(keys_n: jax.Array, key: jax.Array, num_clusters: int,
           iters: int = 10, chunk: int = 262_144):
    """Lloyd k-means on normalized vectors (cosine = dot assignment).

    Works in the input dtype for the big reads; centroid accumulation is
    f32. Memory: O(R·E) input + O(chunk·P) transient scores.
    """
    r, e = keys_n.shape
    init_idx = jax.random.choice(key, r, shape=(num_clusters,),
                                 replace=False)
    centroids = keys_n[init_idx].astype(jnp.float32)

    chunk = min(chunk, r)
    n_chunks = (r + chunk - 1) // chunk
    pad = n_chunks * chunk - r
    keys_p = jnp.pad(keys_n, ((0, pad), (0, 0)))
    chunks = keys_p.reshape(n_chunks, chunk, e)
    valid_p = (jnp.arange(n_chunks * chunk) < r).reshape(n_chunks, chunk)

    def assign_chunk(centroids_b, chunk_keys, chunk_valid):
        scores = jnp.dot(chunk_keys, centroids_b.T,
                         preferred_element_type=jnp.float32)
        a = jnp.argmax(scores, axis=1).astype(jnp.int32)
        return jnp.where(chunk_valid, a, num_clusters)

    def step(_, centroids):
        centroids_b = centroids.astype(keys_n.dtype)

        def acc_chunk(carry, inputs):
            sums, counts = carry
            ck, cv = inputs
            a = assign_chunk(centroids_b, ck, cv)
            sums = sums + jax.ops.segment_sum(
                ck.astype(jnp.float32), a, num_segments=num_clusters + 1)
            counts = counts + jax.ops.segment_sum(
                jnp.ones((chunk,), jnp.float32), a,
                num_segments=num_clusters + 1)
            return (sums, counts), None

        init = (jnp.zeros((num_clusters + 1, e), jnp.float32),
                jnp.zeros((num_clusters + 1,), jnp.float32))
        (sums, counts), _ = jax.lax.scan(acc_chunk, init, (chunks, valid_p))
        new_c = sums[:num_clusters] / jnp.maximum(
            counts[:num_clusters, None], 1.0)
        new_c = l2_normalize(new_c)
        return jnp.where(counts[:num_clusters, None] > 0, new_c, centroids)

    centroids = jax.lax.fori_loop(0, iters, step, centroids)

    centroids_b = centroids.astype(keys_n.dtype)
    assignment = jax.lax.map(
        lambda args: assign_chunk(centroids_b, *args),
        (chunks, valid_p)).reshape(-1)[:r]
    return centroids, assignment


@partial(jax.jit, static_argnames=("num_clusters", "capacity"))
def _bucketize(keys_n, assignment, num_clusters: int, capacity: int):
    """Scatter rows into fixed-capacity cluster buckets (overflow drops)."""
    r = keys_n.shape[0]
    order = jnp.argsort(assignment)
    sorted_assign = assignment[order]
    first_pos = jnp.searchsorted(sorted_assign, jnp.arange(num_clusters))
    rank = jnp.arange(r) - first_pos[sorted_assign]
    fits = rank < capacity
    slot = jnp.where(fits, sorted_assign * capacity + rank,
                     num_clusters * capacity)

    flat_keys = jnp.zeros((num_clusters * capacity + 1, keys_n.shape[1]),
                          keys_n.dtype).at[slot].set(keys_n[order])
    flat_ids = jnp.full((num_clusters * capacity + 1,), -1,
                        jnp.int32).at[slot].set(order.astype(jnp.int32))
    dropped = (~fits).sum().astype(jnp.int32)
    keys_b = flat_keys[:-1].reshape(num_clusters, capacity, -1)
    ids_b = flat_ids[:-1].reshape(num_clusters, capacity)
    return keys_b, ids_b, ids_b >= 0, dropped


def build_ivf(keys: jax.Array, key: jax.Array, num_clusters: int = 1024,
              capacity: int | None = None, iters: int = 10,
              normalized: bool = False) -> IVFIndex:
    """Build an IVF index over library keys.

    Pass ``normalized=True`` (and ideally bf16 keys) at large R to avoid
    an extra full-size normalization copy.
    """
    keys_n = keys if normalized else l2_normalize(keys)
    r = keys.shape[0]
    if capacity is None:
        capacity = max(32, int(2 * r / num_clusters))
    centroids, assignment = kmeans(keys_n, key, num_clusters, iters=iters)
    keys_b, ids_b, valid, dropped = _bucketize(keys_n, assignment,
                                               num_clusters, capacity)
    return IVFIndex(centroids=centroids, keys=keys_b, row_ids=ids_b,
                    valid=valid, dropped=dropped,
                    num_clusters=num_clusters, capacity=capacity)


@partial(jax.jit, static_argnames=("k", "nprobe"))
def ivf_search(index: IVFIndex, queries: jax.Array, k: int,
               nprobe: int = 8):
    """Top-k approximate search.

    Returns ``(scores (Q, k), row_ids (Q, k))`` — row ids into the
    original key array (may include -1 if fewer than k valid candidates).
    """
    q = l2_normalize(queries).astype(index.keys.dtype)
    cents = index.centroids.astype(index.keys.dtype)
    c_scores = jnp.dot(q, cents.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(c_scores, nprobe)            # (Q, nprobe)

    cand_keys = index.keys[probe]                         # (Q, np, cap, E)
    cand_ids = index.row_ids[probe]                       # (Q, np, cap)
    cand_valid = index.valid[probe]

    scores = jnp.einsum("qe,qpce->qpc", q, cand_keys,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(cand_valid, scores, -jnp.inf)
    qn = queries.shape[0]
    flat_scores = scores.reshape(qn, -1)
    flat_ids = cand_ids.reshape(qn, -1)
    s, pos = jax.lax.top_k(flat_scores, k)
    return s, jnp.take_along_axis(flat_ids, pos, axis=1)
