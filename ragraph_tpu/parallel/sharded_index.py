"""ICI-sharded retrieval index: local top-k + global merge.

The scalability axis of the reference is the library size R in the
``(Q, R)`` similarity matmul — the edge variant chunks over Q on one GPU
(``RAGraph_edge/modules/RAGraph.py:298-324``). The TPU-native design
shards R over the mesh's ``idx`` axis:

1. each device scores the replicated queries against its R/D local rows
   (MXU matmul) and takes a *local* top-k;
2. the ``(Q, k)`` candidates (scores + global row ids) are all-gathered
   over ICI — k·D values per query instead of R;
3. a final top-k over the k·D candidates yields the exact global result.

This is mathematically exact (top-k distributes over unions) and moves
O(k·D) bytes over ICI instead of O(R).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P



def sharded_cosine_topk(mesh: Mesh, queries: jax.Array, keys: jax.Array,
                        k: int, valid_mask: jax.Array | None = None,
                        axis_name: str = "idx", local_method: str = "auto",
                        recall_target: float = 0.99,
                        score_dtype: str = "input", rescore_pad: int = 0):
    """Distributed cosine top-k: per-shard local top-k + exact global
    merge. The result is exact whenever the local method is
    (``local_method="exact"/"bucket"``, or ``"auto"`` below 32k local
    rows); with ``"approx"`` locals or the int8 tier the merge is still
    exact over whatever candidates the shards produce — overall recall
    equals the local method's.

    Args:
      queries: ``(Q, E)`` replicated.
      keys: ``(R, E)``, rows sharded over ``axis_name`` (R divisible by the
        axis size). May be a pre-quantized int8 table
        (``ops.topk.quantize_keys_i8``) with ``score_dtype="int8"``.
      valid_mask: optional ``(R,)`` bool, sharded like ``keys``.
      score_dtype / rescore_pad: the int8 MXU scoring tier — see
        ``ops.topk.cosine_topk``. Each shard scores int8 locally; the
        global merge over the gathered candidates is unchanged (with
        ``rescore_pad`` the local candidates carry exact rescored values,
        so the merge stays comparable across shards).

    Returns replicated ``(scores, global_indices)`` of shape ``(Q, k)``.
    """
    if valid_mask is None:
        valid_mask = jnp.ones((keys.shape[0],), dtype=bool)

    def local(q, kk, vm):
        # per-shard top-k is the single-device primitive on the local
        # rows — one method-dispatch implementation (auto threshold,
        # exact/approx/bucket/pallas, interpret-on-CPU) lives in
        # ops.topk.cosine_topk; under "auto" the local shard therefore
        # also picks the exact bucket kernel when recall_target >= 1.0,
        # matching the documented single-device policy.
        from ragraph_tpu.ops.topk import cosine_topk
        rows_local = kk.shape[0]
        k_local = min(k, rows_local)
        s_loc, i_loc = cosine_topk(q, kk, k_local, valid_mask=vm,
                                   method=local_method,
                                   recall_target=recall_target,
                                   score_dtype=score_dtype,
                                   rescore_pad=rescore_pad)
        offset = jax.lax.axis_index(axis_name) * rows_local
        i_loc = i_loc + offset
        # gather k·D candidates per query over ICI
        s_all = jax.lax.all_gather(s_loc, axis_name, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i_loc, axis_name, axis=1, tiled=True)
        s_top, pos = jax.lax.top_k(s_all, k)
        i_top = jnp.take_along_axis(i_all, pos, axis=1)
        return s_top, i_top

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated after the all_gather+topk
    )(queries, keys, valid_mask)


def sharded_gather_rows(mesh: Mesh, values: jax.Array, indices: jax.Array,
                        axis_name: str = "idx") -> jax.Array:
    """Gather library rows by *global* index from a row-sharded table.

    Each device contributes its local rows (zeros elsewhere) and a psum
    completes the gather — O(Q·k·E / D) local work, one ICI reduction.
    """
    def local(vals, idx):
        rows_local = vals.shape[0]
        offset = jax.lax.axis_index(axis_name) * rows_local
        local_idx = idx - offset
        in_range = (local_idx >= 0) & (local_idx < rows_local)
        safe = jnp.clip(local_idx, 0, rows_local - 1)
        got = vals[safe] * in_range[..., None].astype(vals.dtype)
        return jax.lax.psum(got, axis_name)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(),
        check_vma=False,  # psum makes the result replicated
    )(values, indices)


def sharded_retrieve(mesh: Mesh, queries: jax.Array, keys: jax.Array,
                     values: jax.Array, labels: jax.Array, k: int,
                     valid_mask: jax.Array | None = None):
    """Full sharded retrieval: top-k + value/label gather.

    Returns ``(rag_values (Q,k,Ev), rag_labels (Q,k,C))`` replicated.
    """
    _, idx = sharded_cosine_topk(mesh, queries, keys, k, valid_mask)
    vals = sharded_gather_rows(mesh, values, idx)
    labs = sharded_gather_rows(mesh, labels, idx)
    return vals, labs
