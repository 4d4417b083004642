"""Cosine-scored top-k retrieval (XLA path).

Reference query phase: dense cosine similarity ``(Q, R)`` + ``torch.topk``
(``RAGraph_node/ragraph_utils/ToyGraphBase.py:47-71``;
``RAGraph_edge/modules/RAGraph.py:298-324`` chunks over Q on GPU).

TPU-native formulation: the score matrix is one MXU matmul; ``lax.top_k``
runs on-device. For libraries that fit HBM comfortably this XLA version is
already near speed-of-light (the matmul dominates); the Pallas blocked
variant that never materializes ``(Q, R)`` lives in
``ragraph_tpu.ops.pallas_retrieval``, and the ICI-sharded index in
``ragraph_tpu.parallel.sharded_index``.

Masking: library slots beyond the fill count get score ``-inf`` so a
preallocated, partially-filled library behaves exactly like the reference's
grow-by-cat tensors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ragraph_tpu.ops.similarity import l2_normalize


# Library size above which "auto" switches to the TPU-native
# PartialReduce (approx_max_k) path: below this, the exact sort is cheap.
AUTO_APPROX_THRESHOLD = 32_768


def _quantize_i8(x: jax.Array) -> jax.Array:
    """Symmetric int8 quantization for L2-normalized rows (scale 127)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * 127.0),
                    -127, 127).astype(jnp.int8)


def quantize_keys_i8(keys: jax.Array, normalized: bool = False) -> jax.Array:
    """Pre-quantize a key table for ``cosine_topk(score_dtype="int8")``.

    Quantizing the (R, E) table is a full HBM pass — done inside every
    query call it erases most of the int8 speedup (measured: 1.07x vs
    1.5x at R=262k). Serving should quantize once per library
    build/refresh and pass the int8 table as ``keys``.
    """
    kn = keys if normalized else l2_normalize(keys)
    return _quantize_i8(kn)


@partial(jax.jit, static_argnames=("k", "method", "recall_target",
                                   "queries_normalized", "keys_normalized",
                                   "score_dtype", "rescore_pad"))
def cosine_topk(queries: jax.Array, keys: jax.Array, k: int,
                valid_mask: jax.Array | None = None,
                queries_normalized: bool = False,
                keys_normalized: bool = False,
                method: str = "auto",
                recall_target: float = 0.99,
                score_dtype: str = "input",
                rescore_pad: int = 0,
                rescore_keys: jax.Array | None = None):
    """Top-k cosine scores and indices of ``queries`` against ``keys``.

    Args:
      queries: ``(Q, E)``.
      keys: ``(R, E)`` library keys (rows beyond the fill count arbitrary).
      k: static number of neighbors.
      valid_mask: ``(R,)`` bool — which library rows are live.
      method: ``"exact"`` (full sort), ``"approx"`` (TPU PartialReduce via
        ``lax.approx_max_k`` — on a v5e this is ~400x faster than the sort
        at R=262k and lets XLA avoid materializing the f32 score matrix),
        ``"bucket"`` (two-phase exact kernel, bitwise-equal to the sort at
        ~2x the approx cost, :mod:`ragraph_tpu.ops.bucket_topk`),
        ``"pallas"`` (single-pass running-merge kernel,
        :mod:`ragraph_tpu.ops.pallas_retrieval`), or ``"auto"`` (exact sort
        below :data:`AUTO_APPROX_THRESHOLD` rows; above it, ``"bucket"``
        when ``recall_target >= 1.0`` and ``"approx"`` otherwise).
      score_dtype: ``"input"`` (score at the inputs' dtype — the default,
        bitwise-stable vs earlier releases) or ``"int8"``: quantize the
        normalized rows symmetrically to int8 and score with the MXU's
        double-rate s8xs8->s32 path (394 vs 197 TOPS on v5e; native rate
        verified at 1.91x on an 8k^3 matmul). Ranking is invariant to the
        uniform positive scale; the quantization step (1/127 ~= bf16's
        2^-8 on unit-normalized data) costs recall: measured at
        R=262k/E=128/Q=2048/k=10 on v5e, 0.587 ms (1.52x bf16, 3.49M q/s)
        at recall@10 0.9254 vs bf16+approx's 0.9952
        (experiments/int8_retrieval_bench.py). Only valid with methods
        whose contract is already approximate (``approx``/``exact``-sort);
        raises for ``bucket``/``pallas`` (they promise exact bf16 scores).
      rescore_pad: with ``score_dtype="int8"``, fetch ``k + rescore_pad``
        candidates from the int8 scores (at a relaxed recall target —
        ``approx_max_k``'s cost explodes with k at high targets, and
        misses concentrate at the tail of the widened window), then
        exact-rescore just the candidates at the keys' dtype and return
        the true top-k of that set with full-precision scores. Measured:
        ``rescore_pad=22`` (k=10 -> 32 candidates) = 0.698 ms (1.24x
        bf16) at recall@10 0.9875.
      rescore_keys: the PRODUCTION serving combination — score against a
        pre-quantized int8 ``keys`` table (from :func:`quantize_keys_i8`,
        so the per-call full-HBM quantization pass is skipped) while
        rescoring the ``k + rescore_pad`` candidates against this float
        ``(R, E)`` table (same rows; normalized iff ``keys_normalized``).
        The rescore gather touches only ``Q*(k+pad)`` rows, so the int8
        matmul's 2.2x throughput survives. Only valid with int8 ``keys``
        and ``rescore_pad > 0``.

    Returns:
      ``(scores, indices)`` of shape ``(Q, k)``. With ``score_dtype=
      "int8"`` and no rescore the scores are the (uniformly scaled)
      quantized approximations.
    """
    q = queries if queries_normalized else l2_normalize(queries)
    if rescore_keys is not None and (
            keys.dtype != jnp.int8 or not rescore_pad):
        raise ValueError("rescore_keys is only meaningful with "
                         "pre-quantized int8 keys and rescore_pad > 0")
    if keys.dtype == jnp.int8:
        # pre-quantized table from quantize_keys_i8 (already normalized)
        if score_dtype != "int8":
            raise ValueError("int8 keys require score_dtype='int8'")
        if rescore_pad and rescore_keys is None:
            raise ValueError("rescore_pad needs full-precision rows; "
                             "pass the float table as rescore_keys (or "
                             "pass float keys to quantize per call)")
        kk = keys
    else:
        kk = keys if keys_normalized else l2_normalize(keys)
    if rescore_keys is not None and not keys_normalized:
        rescore_keys = l2_normalize(rescore_keys)
    if method == "auto":
        if keys.shape[0] < AUTO_APPROX_THRESHOLD:
            method = "exact"        # full sort is cheap at this size
        elif recall_target >= 1.0:
            method = "bucket"       # exact results requested at scale
        else:
            method = "approx"
    if score_dtype == "int8":
        if method not in ("approx", "exact"):
            raise ValueError(
                f"score_dtype='int8' breaks method={method!r}'s exact-"
                "score contract; use method='approx' or 'exact'")
        return _int8_topk(q, kk, k, valid_mask, method, recall_target,
                          rescore_pad, rescore_keys)
    if score_dtype != "input":
        raise ValueError(f"unknown score_dtype {score_dtype!r}")
    if rescore_pad:
        raise ValueError("rescore_pad is only meaningful with "
                         "score_dtype='int8'")
    if method == "bucket":
        # exact fused two-phase kernel: bitwise-equal to the full sort,
        # ~2x of approx_max_k at R=262k (4.6 vs 2.4 ms on v5e) — the
        # default when exact results are required at scale
        from ragraph_tpu.ops.bucket_topk import bucketed_exact_topk
        return bucketed_exact_topk(q, kk, k, valid_mask=valid_mask,
                                   interpret=jax.default_backend() == "cpu")
    if method == "pallas":
        from ragraph_tpu.ops.pallas_retrieval import fused_cosine_topk
        return fused_cosine_topk(q, kk, k, valid_mask=valid_mask,
                                 interpret=jax.default_backend() == "cpu")
    scores = jnp.dot(q, kk.T, preferred_element_type=jnp.float32)
    if valid_mask is not None:
        scores = jnp.where(valid_mask[None, :], scores, -jnp.inf)
    if method == "approx":
        return jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    return jax.lax.top_k(scores, k)


def _int8_topk(q, kk, k, valid_mask, method, recall_target, rescore_pad,
               rescore_keys=None):
    """Int8-scored top-k (+ optional exact candidate rescore).

    ``q``/``kk`` are already L2-normalized; see :func:`cosine_topk`'s
    ``score_dtype`` docs for the measured speed/recall trade-off.
    """
    ki = kk if kk.dtype == jnp.int8 else _quantize_i8(kk)
    s32 = jnp.dot(_quantize_i8(q), ki.T,
                  preferred_element_type=jnp.int32)
    # uniform positive scale: per-row ranking-invariant; the convert
    # fuses into the PartialReduce / sort consumer
    scores = s32.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
    if valid_mask is not None:
        scores = jnp.where(valid_mask[None, :], scores, -jnp.inf)
    if not rescore_pad:
        if method == "approx":
            return jax.lax.approx_max_k(scores, k,
                                        recall_target=recall_target)
        return jax.lax.top_k(scores, k)
    kc = min(k + rescore_pad, kk.shape[0])  # small shards/libraries
    if method == "approx":
        _, cand = jax.lax.approx_max_k(
            scores, kc, recall_target=min(recall_target, 0.9))
    else:
        _, cand = jax.lax.top_k(scores, kc)
    rows = jnp.take(kk if rescore_keys is None else rescore_keys,
                    cand, axis=0)                      # (Q, kc, E)
    sc = jnp.einsum("qe,qpe->qp", q.astype(rows.dtype), rows,
                    preferred_element_type=jnp.float32)
    if valid_mask is not None:
        # candidates are only invalid when a query has < kc valid rows
        sc = jnp.where(jnp.take(valid_mask, cand, axis=0), sc, -jnp.inf)
    vals, pos = jax.lax.top_k(sc, k)
    return vals, jnp.take_along_axis(cand, pos, axis=1)


def topk_gather(values: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather library rows for each query: ``(R, E)[(Q, k)] -> (Q, k, E)``."""
    return jnp.take(values, indices, axis=0)
