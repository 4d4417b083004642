"""Fused blocked cosine-score + exact-top-k Pallas kernel.

Why: XLA's ``lax.top_k`` over a ``(Q, R)`` score matrix is a full sort —
at R=262k it costs ~950 ms on a v5e and forces the 2 GB f32 score matrix
into HBM. ``lax.approx_max_k`` fixes the speed but is approximate. This
kernel is the exact path at approx-like speed:

- grid ``(Q/BQ, R/BR)`` with the R axis innermost; each step computes one
  ``(BQ, BR)`` score tile on the MXU (bf16 in, f32 out) entirely in VMEM —
  the full score matrix never exists;
- a running per-query top-k (scores + global indices) lives in VMEM
  scratch across R steps; tiles are merged by an insertion loop
  (``merge='insert'``, default) that extracts tile maxima only while some
  query's candidate still beats its running k-th best — the running
  threshold tightens quickly, so steady-state tiles cost ~1 extra VPU
  pass — or by a fixed ``k``-extraction rebuild (``merge='rebuild'``);
- the final tile writes the sorted top-k to the output.

Measured on v5e at R=262k, E=128, Q=2048, k=10: 9.2 ms/batch exact
(bitwise-equal scores vs the XLA sort, which takes ~950 ms — 105x), vs
2.4 ms for the approximate ``lax.approx_max_k`` path. The two-phase
bucket kernel (:mod:`ragraph_tpu.ops.bucket_topk`, 4.6 ms) has since
superseded this as the default exact path; this single-pass variant
remains useful when the running merge must stay fused in one kernel
(e.g. tight VMEM). A 128-lane sub-chunked insert merge was also tried:
the per-chunk ``while_loop`` overhead made it 3x *slower* (27.7 ms).

Reference behavior replaced: ``ToyGraphBase.retrieve``'s dense
``cosine → torch.topk`` (``RAGraph_node/ragraph_utils/ToyGraphBase.py:
47-71``) and the edge variant's chunked loop
(``RAGraph_edge/modules/RAGraph.py:298-324``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38  # python float: jnp scalars would be captured tracers


def _merge_topk(best_s, best_i, tile_s, tile_i, k: int):
    """k max-extractions over [best ∥ tile] -> new sorted (BQ, k_pad)."""
    cat_s = jnp.concatenate([best_s, tile_s], axis=1)
    cat_i = jnp.concatenate([best_i, tile_i], axis=1)
    bq, width = cat_s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, width), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, best_s.shape, 1)

    new_s = jnp.full_like(best_s, NEG_INF)
    new_i = jnp.zeros_like(best_i)
    for t in range(k):
        cur = jnp.max(cat_s, axis=1, keepdims=True)              # (BQ, 1)
        is_max = cat_s == cur
        pos = jnp.min(jnp.where(is_max, col, width), axis=1,
                      keepdims=True)                              # (BQ, 1)
        sel = col == pos
        cur_i = jnp.sum(jnp.where(sel, cat_i, 0), axis=1,
                        keepdims=True)                            # (BQ, 1)
        # column write via where (Mosaic has no scatter lowering)
        new_s = jnp.where(out_col == t, cur, new_s)
        new_i = jnp.where(out_col == t, cur_i, new_i)
        cat_s = jnp.where(sel, NEG_INF, cat_s)
    return new_s, new_i


def _insert_merge(best_s, best_i, tile, gidx, k: int,
                  extract_per_iter: int = 1):
    """Insertion merge: extract tile maxima and insert each into the
    sorted running buffer, looping only while some query still has a tile
    entry beating its k-th best. With random data the expected number of
    iterations per tile rapidly drops (vs always-k for the rebuild merge)
    because the running threshold tightens. ``extract_per_iter`` unrolls
    several extractions per while-iteration to amortize loop overhead.
    """
    bq, br = tile.shape
    k_pad = best_s.shape[1]
    col_t = jax.lax.broadcasted_iota(jnp.int32, (bq, br), 1)
    col_b = jax.lax.broadcasted_iota(jnp.int32, (bq, k_pad), 1)

    # the running tile row-max is CARRIED through the loop so the cond
    # check is O(BQ) instead of a full (BQ, BR) pass per iteration
    def cond(state):
        tile_s, bs, bi, cur = state
        return jnp.any(cur[:, 0] > bs[:, k - 1])

    def one_extract(state):
        tile_s, bs, bi, cur = state                               # cur (BQ,1)
        is_max = tile_s == cur
        pos = jnp.min(jnp.where(is_max, col_t, br), axis=1,
                      keepdims=True)
        sel = col_t == pos
        cur_i = jnp.sum(jnp.where(sel, gidx, 0), axis=1,
                        keepdims=True)
        tile_s = jnp.where(sel, NEG_INF, tile_s)

        # sorted insert of (cur, cur_i) into (bs, bi), only where it wins
        wins = cur[:, 0] > bs[:, k - 1]                           # (BQ,)
        ins = jnp.sum((bs > cur).astype(jnp.int32), axis=1,
                      keepdims=True)                              # (BQ, 1)
        # shift right from the insertion point
        shifted_s = jnp.concatenate(
            [bs[:, :1], bs[:, :-1]], axis=1)
        shifted_i = jnp.concatenate(
            [bi[:, :1], bi[:, :-1]], axis=1)
        new_s = jnp.where(col_b < ins, bs,
                          jnp.where(col_b == ins, cur, shifted_s))
        new_i = jnp.where(col_b < ins, bi,
                          jnp.where(col_b == ins, cur_i, shifted_i))
        w = wins[:, None]
        next_cur = jnp.max(tile_s, axis=1, keepdims=True)
        return (tile_s, jnp.where(w, new_s, bs),
                jnp.where(w, new_i, bi), next_cur)

    def body(state):
        for _ in range(extract_per_iter):
            state = one_extract(state)
        return state

    cur0 = jnp.max(tile, axis=1, keepdims=True)
    _, bs, bi, _ = jax.lax.while_loop(cond, body,
                                      (tile, best_s, best_i, cur0))
    return bs, bi


def _kernel(q_ref, k_ref, vm_ref, out_s_ref, out_i_ref,
            best_s, best_i, *, k: int, k_pad: int, block_r: int,
            merge: str, extract_per_iter: int = 1):
    j = pl.program_id(1)
    n_r = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, NEG_INF)
        best_i[:] = jnp.zeros_like(best_i)

    tile = jnp.dot(q_ref[:], k_ref[:].T,
                   preferred_element_type=jnp.float32)            # (BQ, BR)
    valid = vm_ref[:].reshape(1, -1) != 0
    tile = jnp.where(valid, tile, NEG_INF)

    bq = tile.shape[0]
    gidx = (j * block_r
            + jax.lax.broadcasted_iota(jnp.int32, (bq, block_r), 1))

    if merge == "insert":
        new_s, new_i = _insert_merge(best_s[:], best_i[:], tile, gidx, k,
                                     extract_per_iter=extract_per_iter)
        best_s[:] = new_s
        best_i[:] = new_i
    else:
        # Threshold skip: once the running k-th best beats everything in
        # this tile the k-extraction rebuild is provably a no-op.
        kth_best = best_s[:, k - 1]                               # (BQ,)
        tile_rowmax = jnp.max(tile, axis=1)
        needs_merge = jnp.any(tile_rowmax > kth_best)

        @pl.when(needs_merge)
        def _():
            new_s, new_i = _merge_topk(best_s[:], best_i[:], tile, gidx, k)
            best_s[:] = new_s
            best_i[:] = new_i

    @pl.when(j == n_r - 1)
    def _():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


@functools.partial(jax.jit,
                   static_argnames=("k", "block_q", "block_r", "interpret",
                                    "merge", "extract_per_iter"))
def fused_cosine_topk(queries: jax.Array, keys_n: jax.Array, k: int,
                      valid_mask: jax.Array | None = None,
                      block_q: int = 256, block_r: int = 2048,
                      interpret: bool = False, merge: str = "insert",
                      extract_per_iter: int = 1):
    """Exact fused top-k.

    Args:
      queries: ``(Q, E)`` **already L2-normalized** (any float dtype;
        scored in bf16).
      keys_n: ``(R, E)`` already L2-normalized.
      valid_mask: ``(R,)`` bool; invalid rows never surface.

    Returns ``(scores (Q, k) f32, indices (Q, k) int32)``, sorted
    descending. Q and R are padded internally to the block sizes.
    """
    q_len, e = queries.shape
    r_len = keys_n.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((r_len,), dtype=jnp.int32)
    else:
        valid_mask = valid_mask.astype(jnp.int32)

    k_pad = max(k, 128)  # lane-width-aligned running buffer

    # pad Q and R to block multiples
    q_pad = (-q_len) % block_q
    r_pad = (-r_len) % block_r
    q_in = jnp.pad(queries.astype(jnp.bfloat16), ((0, q_pad), (0, 0)))
    k_in = jnp.pad(keys_n.astype(jnp.bfloat16), ((0, r_pad), (0, 0)))
    vm_in = jnp.pad(valid_mask, (0, r_pad))

    grid = (q_in.shape[0] // block_q, k_in.shape[0] // block_r)

    out_s, out_i = pl.pallas_call(
        functools.partial(_kernel, k=k, k_pad=k_pad, block_r=block_r,
                          merge=merge, extract_per_iter=extract_per_iter),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, e), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, e), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r,), lambda i, j: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, k_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_in.shape[0], k_pad), jnp.float32),
            jax.ShapeDtypeStruct((q_in.shape[0], k_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, k_pad), jnp.float32),
            pltpu.VMEM((block_q, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(q_in, k_in, vm_in)

    return out_s[:q_len, :k], out_i[:q_len, :k]
