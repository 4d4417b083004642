"""Two-phase exact top-k: bucket-maxima sweep + candidate rescore.

The exact retrieval problem the single-pass kernel
(:mod:`ragraph_tpu.ops.pallas_retrieval`) solves with a running merge is
bottlenecked by VPU extraction passes over full score tiles (9 ms vs
2.2 ms for ``lax.approx_max_k`` at R=262k/Q=2048/k=10 on v5e). This module
splits the work so the expensive pass does *no* merging at all:

**Phase 1 (Pallas)** — the score matmul, reduced immediately to per-bucket
maxima: buckets are 128-column (lane-width) groups of library rows, so a
``(BR, BQ)`` transposed score tile collapses to ``(BR/128, BQ)`` with one
sublane-group max. Cost ≈ the matmul + one reduce pass — the same work the
approximate PartialReduce path does. Output: ``(R/128, Q)`` bucket maxima.

**Glue (XLA)** — each query's top-k *buckets*. Exactness argument: the k
largest bucket maxima are k distinct elements, so the true k-th largest
element is ≥ the k-th largest bucket max τ; every true top-k element is
therefore ≥ τ, and its bucket's max is ≥ τ, i.e. **the true top-k elements
all live in the top-k buckets ranked by bucket max** (under exact score
ties an equal-valued element from a dropped tied bucket may be swapped in,
which changes indices but never the score multiset). Buckets are found
with k unrolled max-extractions — O(k·Q·R/128) fused VPU work, far cheaper
than a sort.

**Phase 2 (Pallas)** — rescore only the chosen (query, bucket) pairs,
bucket-major: each grid step holds a block of key buckets in VMEM plus the
*entire* query matrix (bf16), selects each bucket's assigned queries with
a one-hot MXU matmul (no dynamic gather needed), and emits exact
``(P, 128)`` score panels. The per-bucket assignment lists are built in
XLA by sorting the Q·k pairs by bucket. Buckets wanted by more than ``P``
queries overflow into a fallback pair list handled by a ``lax.cond``-gated
dense gather — rare (Poisson tail) but required for exactness on
adversarial inputs (e.g. all-identical queries).

**Phase 3 (XLA)** — scatter the panels into a ``(Q, k·128)`` candidate
matrix and take the final top-k with k unrolled extractions; candidate
indices are affine in (bucket id, lane).

Scores are bitwise-identical to ``top_k(dot(q.bf16, keys.bf16^T, f32))``:
phase 2 recomputes the same bf16-input/f32-accumulate dot products, and
one-hot selection reproduces query rows exactly.

Replaces the reference's dense ``cosine → torch.topk``
(``RAGraph_node/ragraph_utils/ToyGraphBase.py:47-71``) and chunked edge
retrieval (``RAGraph_edge/modules/RAGraph.py:298-324``) as the exact path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38
LANE = 128  # bucket width


def _bucket_max_kernel(k_ref, q_ref, vm_ref, bm_ref, *, block_r: int,
                       subtile: int = 0):
    """One (BR, BQ) transposed score tile -> (BR/128, BQ) bucket maxima.

    ``subtile > 0`` splits the R dimension into subtile-row chunks and
    reduces each chunk right after its matmul, so the MXU (next chunk's
    dot) can overlap the VPU (this chunk's 128-group max) in Mosaic's
    schedule instead of serializing one huge dot then one huge reduce.
    """
    if subtile and subtile < block_r:
        qt = q_ref[:].T
        for s in range(block_r // subtile):
            t = jnp.dot(k_ref[s * subtile:(s + 1) * subtile, :], qt,
                        preferred_element_type=jnp.float32)
            vm = vm_ref[s * subtile:(s + 1) * subtile].reshape(-1, 1)
            t = jnp.where(vm != 0, t, NEG_INF)
            bm_ref[s * subtile // LANE:(s + 1) * subtile // LANE, :] = \
                t.reshape(subtile // LANE, LANE, t.shape[1]).max(axis=1)
        return
    tile = jnp.dot(k_ref[:], q_ref[:].T,
                   preferred_element_type=jnp.float32)     # (BR, BQ)
    tile = jnp.where(vm_ref[:].reshape(-1, 1) != 0, tile, NEG_INF)
    bq = tile.shape[1]
    bm_ref[:] = tile.reshape(block_r // LANE, LANE, bq).max(axis=1)


def _rescore_kernel(assign_ref, q_ref, k_ref, vm_ref, out_ref, *,
                    buckets_per_step: int, p_max: int):
    """Exact scores for each bucket's assigned queries.

    assign_ref: (BB, P) int32 query ids (>= Q means empty slot).
    q_ref: (Q_pad, E) bf16 — the whole query matrix, VMEM-resident.
    k_ref: (BB*128, E) bf16 key rows; vm_ref: (BB*128,) int32.
    out_ref: (BB, P, 128) f32.
    """
    q_all = q_ref[:].astype(jnp.float32)
    n_q = q_all.shape[0]
    qcol = jax.lax.broadcasted_iota(jnp.int32, (p_max, n_q), 1)
    for b in range(buckets_per_step):
        idx = assign_ref[b, :]                              # (P,)
        onehot = (qcol == idx[:, None]).astype(jnp.float32)
        # one-hot row select on the MXU: copies bf16-valued rows exactly
        qsel = jnp.dot(onehot, q_all,
                       preferred_element_type=jnp.float32)  # (P, E)
        keys_b = k_ref[b * LANE:(b + 1) * LANE, :]
        sc = jnp.dot(qsel.astype(jnp.bfloat16), keys_b.T,
                     preferred_element_type=jnp.float32)    # (P, 128)
        vm_b = vm_ref[b * LANE:(b + 1) * LANE].reshape(1, -1)
        out_ref[b, :, :] = jnp.where(vm_b != 0, sc, NEG_INF)


def _col_topk_kernel(x_ref, vals_ref, idx_ref, *, k: int):
    """Per-COLUMN top-k of an (R, BQ) tile by k max-extractions, one
    kernel instead of ~3k tiny XLA ops (their launch gaps dominate the
    in-jit-chained exact-topk wall time). Ties -> lowest row index."""
    x = x_ref[:].astype(jnp.float32)               # (R, BQ)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    big = jnp.int32(2 ** 30)
    vs, ps = [], []
    for _ in range(k):
        cur = jnp.max(x, axis=0, keepdims=True)            # (1, BQ)
        pos = jnp.min(jnp.where(x >= cur, row, big), axis=0,
                      keepdims=True)                       # (1, BQ)
        vs.append(cur)
        ps.append(pos)
        x = jnp.where(row == pos, NEG_INF, x)
    vals_ref[:] = jnp.concatenate(vs, axis=0)
    idx_ref[:] = jnp.concatenate(ps, axis=0)


@functools.partial(jax.jit, static_argnames=("k", "block_q", "interpret"))
def column_topk(x: jax.Array, k: int, block_q: int = 256,
                interpret: bool = False):
    """Exact top-k over axis 0 for every column of ``x (R, Q)``.

    Returns ``(vals (Q, k), idx (Q, k))`` sorted descending — the same
    result as ``iterative_topk(x.T, k)`` without materializing the
    transpose. Pads Q to ``block_q``.

    The whole ``(r, block_q)`` column block must sit in VMEM (128 MB on
    v5e, double-buffered, shared with the out/scratch windows):
    ``block_q`` shrinks automatically for tall inputs; above ~48k rows
    callers should use ``iterative_topk`` on the transpose instead
    (``bucketed_exact_topk`` does).
    """
    r, q = x.shape
    while block_q > 128 and r * block_q * 4 * 2 > 50_000_000:
        block_q //= 2
    pad = (-q) % block_q
    x_in = jnp.pad(x, ((0, 0), (0, pad)), constant_values=NEG_INF)
    qp = x_in.shape[1]
    vals, idx = pl.pallas_call(
        functools.partial(_col_topk_kernel, k=k),
        grid=(qp // block_q,),
        in_specs=[pl.BlockSpec((r, block_q), lambda j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((k, block_q), lambda j: (0, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((k, block_q), lambda j: (0, j),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((k, qp), jnp.float32),
                   jax.ShapeDtypeStruct((k, qp), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x_in)
    return vals.T[:q], idx.T[:q]


def _row_topk_kernel(x_ref, vals_ref, idx_ref, *, k: int):
    """Per-ROW top-k of a (BQ, W) tile (ties -> lowest column index)."""
    x = x_ref[:].astype(jnp.float32)               # (BQ, W)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    big = jnp.int32(2 ** 30)
    vs, ps = [], []
    for _ in range(k):
        cur = jnp.max(x, axis=1, keepdims=True)            # (BQ, 1)
        pos = jnp.min(jnp.where(x >= cur, col, big), axis=1,
                      keepdims=True)                       # (BQ, 1)
        vs.append(cur)
        ps.append(pos)
        x = jnp.where(col == pos, NEG_INF, x)
    vals_ref[:] = jnp.concatenate(vs, axis=1)
    idx_ref[:] = jnp.concatenate(ps, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "block_q", "interpret"))
def row_topk(x: jax.Array, k: int, block_q: int = 256,
             interpret: bool = False):
    """Exact top-k over axis 1 of ``x (Q, W)`` as ONE Pallas kernel —
    same result as :func:`iterative_topk`."""
    q, w = x.shape
    pad = (-q) % block_q
    x_in = jnp.pad(x, ((0, pad), (0, 0)), constant_values=NEG_INF)
    qp = x_in.shape[0]
    vals, idx = pl.pallas_call(
        functools.partial(_row_topk_kernel, k=k),
        grid=(qp // block_q,),
        in_specs=[pl.BlockSpec((block_q, w), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((block_q, k), lambda j: (j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((block_q, k), lambda j: (j, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((qp, k), jnp.float32),
                   jax.ShapeDtypeStruct((qp, k), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x_in)
    return vals[:q], idx[:q]


def iterative_topk(x: jax.Array, k: int):
    """Exact top-k by k unrolled max-extractions (XLA, fuses to ~3 VPU
    passes per extraction) — beats ``lax.top_k``'s full sort for small k
    over wide rows. Ties resolve to the lowest index (same as the sort).
    """
    q, w = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (q, w), 1)
    vals, idxs = [], []
    for _ in range(k):
        pos = jnp.argmax(x, axis=1)
        cur = jnp.take_along_axis(x, pos[:, None], axis=1)
        vals.append(cur)
        idxs.append(pos[:, None].astype(jnp.int32))
        x = jnp.where(col == pos[:, None], NEG_INF, x)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(idxs, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("k", "block_q", "block_r", "p_max",
                                    "subtile", "interpret"))
def bucketed_exact_topk(queries: jax.Array, keys_n: jax.Array, k: int,
                        valid_mask: jax.Array | None = None,
                        block_q: int = 2048, block_r: int = 4096,
                        p_max: int = 32, subtile: int = 0,
                        interpret: bool = False):
    """Exact fused top-k at PartialReduce-like speed (see module doc).

    Args:
      queries: ``(Q, E)`` already L2-normalized (scored in bf16).
      keys_n: ``(R, E)`` already L2-normalized.
      valid_mask: ``(R,)`` bool; invalid rows never surface.
      p_max: per-bucket assignment capacity before the fallback path.

    Returns ``(scores (Q, k) f32, indices (Q, k) int32)`` sorted
    descending. Exact scores always; indices may differ from the full sort
    only on exact score ties.

    Tile defaults from the r3 sweep (benchmarks/bench_bucket_tiles.py,
    v5e, R=262k Q=2048 k=10): (block_q=2048, block_r=4096) = 3.27 ms
    in-chain vs 3.44 at the old (512, 4096); approx chain measured
    1.71 ms the same session, so exact ≈ 1.9x approx. The residual gap
    is phase 1's tile-then-reduce structure: the f32 128-group max costs
    ~a full extra VPU pass over the score tiles, where XLA's
    PartialReduce folds its reduction into the matmul epilogue.
    """
    q_len, e = queries.shape
    r_len = keys_n.shape[0]
    if q_len > 4096:
        # phase 2 keeps the whole query matrix in VMEM; cap it by running
        # independent query chunks (queries never interact).
        outs = [bucketed_exact_topk(queries[i:i + 4096], keys_n, k,
                                    valid_mask, block_q=block_q,
                                    block_r=block_r, p_max=p_max,
                                    subtile=subtile, interpret=interpret)
                for i in range(0, q_len, 4096)]
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))
    if subtile and (block_r % subtile or subtile % LANE):
        # silent-corruption guard: the subtile loop writes
        # block_r // subtile chunks — a non-dividing subtile would leave
        # the tail bucket-maxima rows unwritten (garbage VMEM) and the
        # "exact" result silently wrong.
        raise ValueError(f"subtile {subtile} must divide block_r "
                         f"{block_r} and be a multiple of {LANE}")
    if valid_mask is None:
        valid_mask = jnp.ones((r_len,), dtype=jnp.int32)
    else:
        valid_mask = valid_mask.astype(jnp.int32)

    # don't let the tuned 2048 default pad small query batches 8x up
    block_q = min(block_q, -((-q_len) // 256) * 256)
    q_pad = (-q_len) % block_q
    r_pad = (-r_len) % block_r
    q_in = jnp.pad(queries.astype(jnp.bfloat16), ((0, q_pad), (0, 0)))
    k_in = jnp.pad(keys_n.astype(jnp.bfloat16), ((0, r_pad), (0, 0)))
    vm_in = jnp.pad(valid_mask, (0, r_pad))
    qp, rp = q_in.shape[0], k_in.shape[0]
    nb = rp // LANE                                  # total buckets
    if nb < k:
        # tiny library: the dense exact path is already cheap
        scores = jnp.dot(q_in, k_in.T, preferred_element_type=jnp.float32)
        scores = jnp.where(vm_in[None, :] != 0, scores, NEG_INF)
        s, i = jax.lax.top_k(scores, k)
        s = jnp.where(s <= NEG_INF, -jnp.inf, s)  # same contract as below
        return s[:q_len], i[:q_len]

    # ---- phase 1: bucket maxima (nb, Q) ----
    bm = pl.pallas_call(
        functools.partial(_bucket_max_kernel, block_r=block_r,
                          subtile=subtile),
        grid=(rp // block_r, qp // block_q),
        in_specs=[
            pl.BlockSpec((block_r, e), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, e), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r,), lambda j, i: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r // LANE, block_q),
                               lambda j, i: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, qp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(k_in, q_in, vm_in)

    # ---- glue: per-query top-k buckets, inverted to per-bucket lists ----
    if nb * 128 * 4 * 2 <= 50_000_000:
        bv, bi = column_topk(bm, k, interpret=interpret)   # no transpose
        bvals, bucket_ids = bv[:q_len], bi[:q_len]         # (Q, k)
    else:
        # very tall bucket matrix (R > ~12M rows): the per-column kernel
        # block no longer fits VMEM — extract on the transpose
        bvals, bucket_ids = iterative_topk(bm.T[:q_len], k)
    # fewer than k non-empty buckets: the exhausted NEG_INF tail repeats
    # position 0 — replace those slots with the out-of-range sentinel so
    # no bucket is assigned (and thus scattered) twice
    bucket_ids = jnp.where(bvals <= NEG_INF, nb, bucket_ids)

    pair_b = bucket_ids.reshape(-1)                        # (Q*k,)
    pair_q = jnp.repeat(jnp.arange(q_len, dtype=jnp.int32), k)
    pair_s = jnp.tile(jnp.arange(k, dtype=jnp.int32), q_len)
    order = jnp.argsort(pair_b, stable=True)
    sb, sq, ss = pair_b[order], pair_q[order], pair_s[order]
    # first occurrence of each bucket in the sorted pair list — ONE
    # scatter-min (searchsorted lowers to a 15-gather binary search)
    first = jnp.full((nb + 1,), q_len * k, jnp.int32).at[sb].min(
        jnp.arange(q_len * k, dtype=jnp.int32), mode="drop")
    rank = jnp.arange(q_len * k, dtype=jnp.int32) - first[sb]
    real = sb < nb                    # exclude exhausted-slot sentinels
    in_cap = (rank < p_max) | ~real
    # per-bucket query lists; empty / overflow slots get id qp (no query
    # matches in the one-hot, so their panel rows are dead)
    assign = jnp.full((nb, p_max), qp, dtype=jnp.int32)
    assign = assign.at[sb, jnp.where(in_cap, rank, p_max)].set(
        jnp.where(in_cap, sq, qp), mode="drop")
    slot = jnp.zeros((nb, p_max), dtype=jnp.int32)
    slot = slot.at[sb, jnp.where(in_cap, rank, p_max)].set(
        ss, mode="drop")

    # ---- phase 2: rescore assigned (query, bucket) pairs ----
    bb = max(block_r // LANE, 1)                    # buckets per grid step
    panels = pl.pallas_call(
        functools.partial(_rescore_kernel, buckets_per_step=bb,
                          p_max=p_max),
        grid=(nb // bb,),
        in_specs=[
            pl.BlockSpec((bb, p_max), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, e), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb * LANE, e), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb * LANE,), lambda j: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, p_max, LANE), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, p_max, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(assign, q_in, k_in, vm_in)

    # ---- phase 3: scatter panels to per-query candidates, final top-k ---
    cand = jnp.full((q_len + 1, k, LANE), NEG_INF, jnp.float32)
    flat_q = assign.reshape(-1)                            # (nb*P,)
    flat_q = jnp.where(flat_q >= q_len, q_len, flat_q)     # dead -> sentinel
    cand = cand.at[flat_q, slot.reshape(-1)].set(
        panels.reshape(-1, LANE))
    # overflow fallback: pairs beyond p_max, exact-rescored densely.
    n_over = jnp.sum(~in_cap)

    def with_fallback(cand):
        fq = jnp.where(in_cap, q_len, sq)                  # sentinel drops
        fb = jnp.where(in_cap, 0, sb)
        fs = jnp.where(in_cap, 0, ss)
        kb = k_in.reshape(nb, LANE, e)[fb]                 # (Q*k, 128, E)
        qs = jnp.pad(q_in, ((0, 1), (0, 0)))[jnp.minimum(fq, qp)]
        sc = jnp.einsum("pe,ple->pl", qs.astype(jnp.bfloat16),
                        kb.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        vmb = vm_in.reshape(nb, LANE)[fb]
        sc = jnp.where(vmb != 0, sc, NEG_INF)
        return cand.at[fq, fs].set(sc)

    cand = jax.lax.cond(n_over > 0, with_fallback, lambda c: c, cand)
    cand = cand[:q_len].reshape(q_len, k * LANE)

    vals, pos = row_topk(cand, k, interpret=interpret)
    slot_of = pos // LANE
    lane_of = pos % LANE
    g_bucket = jnp.take_along_axis(bucket_ids, slot_of, axis=1)
    g_idx = g_bucket * LANE + lane_of
    # Exhausted slots (query has < k valid candidates) carry the sentinel
    # bucket id nb, making g_idx out of range — and in sharded use a
    # per-shard offset could turn that into a valid-looking id in another
    # shard's row range. Zero them, matching lax.top_k's in-range contract,
    # and lift the finite NEG_INF sentinel to -inf so the score contract
    # matches the masked-sort exact path (callers test isinf / compare
    # across methods; real cosine scores are >= -1 so the test is safe).
    dead = vals <= NEG_INF
    g_idx = jnp.where(dead, 0, g_idx)
    vals = jnp.where(dead, -jnp.inf, vals)
    return vals, g_idx.astype(jnp.int32)
