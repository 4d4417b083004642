"""Shared pieces of the edge (recsys) model family.

Parity targets:
- losses: BPR / NCE / InfoNCE (``RAGraph_edge/modules/base_model.py:81-110``,
  ``modules/utils.py:80-88``) and the embedding L2 reg
  (``modules/RAGraph.py:365-379``);
- LightGCN propagation: gather → binorm scale → segment-sum per layer
  (``modules/RAGraph.py:232-240``);
- relative edge-time encoding: min-max rescale + per-destination segment
  softmax (``modules/RAGraph.py:250-263``);
- edge dropout: Bernoulli keep mask (``modules/utils.py:40-53``) — here a
  *mask*, not a subset: dropped edges get weight 0, which is equivalent
  under segment-sum and keeps every shape static for jit.

The numerical sanitizer ``check_finite`` mirrors ``_check_inf``
(``base_model.py:23-32``) as a jit-friendly ``checkify``-style guard.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ragraph_tpu.ops.segment import segment_softmax
from ragraph_tpu.ops.similarity import l2_normalize


@dataclasses.dataclass(frozen=True)
class EdgeModelConfig:
    """Typed replacement for the argparse singleton
    (``RAGraph_edge/utils/parse_args.py:3-47``)."""

    emb_size: int = 64
    num_layers: int = 3
    edge_dropout: float = 0.5
    emb_dropout: float = 0.0
    weight_decay: float = 1e-4
    lr: float = 1e-3
    batch_size: int = 2048
    eval_batch_size: int = 512
    num_epochs: int = 300
    early_stop_patience: int = 10
    metrics: tuple = ("recall", "ndcg")
    metrics_k: tuple = (20,)
    # RAG knobs (per-dataset table lives in ragraph_edge.py)
    rag_chunk: int | None = None  # retrieval query-chunk size (the
    # reference's per-phase "batch_size", modules/RAGraph.py:39-83);
    # defaults to batch_size
    retrieve_weight: float = 0.3
    retrieve_num: int = 10
    noise_retrieve_num: int = 1
    num_augment_scale: int = 0
    num_inverse_sample: int = 0
    use_noise: bool = False
    lora_rank: int = 16
    # LoRA is OPT-IN here (the reference defaults it on,
    # modules/RAGraph.py:122-160). Measured on real amazon over 3 seeds
    # (results/amazon_real_*.json): LoRA-off 0.01222±0.00004 avg
    # recall@20 > zero-delta LoRA 0.01151±0.00011 > the reference's
    # SVD-init LoRA 0.0091-0.0101 — every LoRA variant loses to its own
    # no-LoRA ablation, and a default must not lose to its own ablation.
    # The training-trajectory parity test (tests/test_reference_parity.py)
    # pins that our SVD-LoRA dynamics match the reference's own torch
    # code, i.e. the deficit is the reference design's, not a porting
    # bug (docs/PARITY.md). Strict reference behavior: use_lora=True +
    # lora_init_scale=1.0 (CLI: --lora svd).
    use_lora: bool = False
    # LoRA A-factor init scale (when use_lora). 1.0 = the reference's
    # SVD init (modules/RAGraph.py:130-155), whose delta at step 0 is
    # rank_r(table) — the top-r subspace of the pretrained table is
    # DOUBLED before any training. 0.0 (default) = zero-delta start (A
    # scaled to 0; gradients still flow, B keeps the SVD row space) —
    # measures 0.01151 vs the SVD init's 0.00907-0.01005 on amazon.
    lora_init_scale: float = 0.0
    # Whether the optimizer trains the A/B factors. The reference ASSIGNS
    # its factors as plain tensors, not nn.Parameters
    # (modules/RAGraph.py:140-158: ``self.user_embedding_A = ...
    # .detach().requires_grad_(True)``), so its Trainer's
    # ``optim.Adam(model.parameters())`` (utils/trainer.py:19-21) never
    # sees them — in the shipped driver the SVD delta is a FROZEN
    # additive bias and only the base tables + gating train. True
    # (default) trains the factors (classic LoRA — required for the
    # zero-init mode to do anything at all); False reproduces the
    # reference driver's frozen-delta dynamics (CLI: --lora svd).
    # Found by the r4 e2e edge differential (-9.5% systematic gap).
    lora_train_factors: bool = True
    # segment-reduction implementation: "auto" picks the fused custom-VJP
    # propagation (bf16 gathers + sorted reduce both directions, ~3x per
    # layer) whenever it applies (TPU + sorted edges + sender-order
    # auxiliaries + static time mode), else the Pallas sorted prefix-sum
    # forward, else XLA scatter-add. "fused"/"sorted"/"scatter" force one.
    segsum_impl: str = "auto"
    # propagation compute dtype: "auto" = bf16 rows with f32 accumulation
    # on TPU (gathers are 3x faster), f32 elsewhere; or "bf16"/"f32".
    propagate_dtype: str = "auto"
    # time-encoding mode: "static" precomputes the per-destination time
    # softmax once per graph in f64 (EdgeGraphArrays.time_norm) and
    # applies inverted-dropout scaling to masked edges; "renorm" matches
    # the reference exactly (recompute the softmax over surviving edges
    # every step, RAGraph.py:250-263) at ~70 ms/step extra at 2M edges
    # (scalar segment ops). See docs/PARITY.md.
    time_mode: str = "static"
    # RAG retrieval scoring tier (ops.topk.cosine_topk score_dtype):
    # "int8" scores the library retrieval on the double-rate s8 MXU path
    # (~2.2x at 262k rows; recall@10 0.92 at the bench shape). Applies to
    # the index-path retrieval only — the huge-k threshold branch keeps
    # the input dtype (its k-th-score threshold needs the same precision
    # as the membership test).
    retrieve_dtype: str = "input"
    # Huge-k threshold-branch selection tier (ops.selection): "f32"
    # (default) keeps the exact f32 k-th-score threshold — bitwise-equal
    # membership to the reference's torch.topk; "bf16" scores the chunk
    # in bf16 and radix-searches 16-bit keys (6 half-width passes vs 11
    # full-width: whole-fusion 4.97 s vs 10.08 s f32 = 2.03x at koubei
    # scale with half the chunk temp memory — results/
    # koubei_scale_dryrun{,_bf16}.json, r4 paired capture;
    # membership admits the bf16 ties at the threshold,
    # a ~1e-3 relative perturbation of a mean over k=100k rows). Only
    # the big_k branch reads this knob.
    selection_dtype: str = "f32"
    # plugin knobs (``parse_args.py:49-63``)
    temp: float = 0.2        # SGL InfoNCE temperature
    lbd: float = 0.1         # CL loss weight (SGL 0.1 / SimGCL 0.5)
    eps: float = 0.1         # SimGCL perturbation magnitude
    n_negs: int = 16         # MixGCF candidate negatives

    def __post_init__(self):
        # Every consumer gates on string equality (``== "bf16"`` /
        # ``== "int8"``) and silently falls back to the default tier on a
        # typo, so fail loudly at construction instead.
        if self.selection_dtype not in ("f32", "bf16"):
            raise ValueError(
                f"selection_dtype must be 'f32' or 'bf16', got "
                f"{self.selection_dtype!r}")
        if self.retrieve_dtype not in ("input", "bf16", "int8"):
            raise ValueError(
                f"retrieve_dtype must be 'input', 'bf16' or 'int8', got "
                f"{self.retrieve_dtype!r}")


def bpr_loss(user_emb, pos_item_emb, neg_item_emb):
    """``-log sigmoid(pos - neg)`` (``base_model.py:81-86``)."""
    pos_score = jnp.sum(user_emb * pos_item_emb, axis=1)
    neg_score = jnp.sum(user_emb * neg_item_emb, axis=1)
    return -jnp.log(1e-10 + jax.nn.sigmoid(pos_score - neg_score)).mean()


def nce_loss(pos_score, neg_score, edge_weight=1.0):
    """``base_model.py:88-93`` (neg_score ``(B, N)``)."""
    numerator = jnp.exp(pos_score)
    denominator = numerator + jnp.exp(neg_score).sum(axis=1)
    return (-jnp.log(numerator / denominator) * edge_weight).mean()


def cal_infonce(view1, view2, temperature: float, b_cos: bool = True,
                mask: jax.Array | None = None):
    """In-batch InfoNCE (``modules/utils.py:80-88``).

    ``mask`` (``(B,)`` bool) excludes padded rows — used with the
    fixed-size ``jnp.unique`` that replaces the reference's
    dynamic-shape ``torch.unique`` dedup (``plugins/SGL.py:111-113``).
    """
    if b_cos:
        view1 = l2_normalize(view1)
        view2 = l2_normalize(view2)
    pos_score = jnp.exp(jnp.sum(view1 * view2, axis=-1) / temperature)
    sim = jnp.dot(view1, view2.T, preferred_element_type=jnp.float32)
    if mask is not None:
        # padded columns must not enter any denominator
        sim = jnp.where(mask[None, :], sim, -jnp.inf)
    ttl_score = jnp.exp(sim / temperature).sum(axis=1)
    losses = -jnp.log(pos_score / ttl_score + 1e-5)
    if mask is not None:
        mm = mask.astype(losses.dtype)
        return jnp.sum(losses * mm) / jnp.maximum(mm.sum(), 1.0)
    return jnp.mean(losses)


def unique_padded(x: jax.Array, size: int):
    """Fixed-size unique: returns (values, valid_mask); padding is -1."""
    vals = jnp.unique(x, size=size, fill_value=-1)
    valid = vals >= 0
    return jnp.where(valid, vals, 0), valid


def reg_loss_emb(user_table, item_table, users, pos_items, neg_items):
    """½(‖u‖² + ‖i⁺‖² + ‖i⁻‖²)/B on the raw tables
    (``modules/RAGraph.py:365-379``)."""
    u = user_table[users]
    p = item_table[pos_items]
    n = item_table[neg_items]
    b = users.shape[0]
    return 0.5 * ((u ** 2).sum() + (p ** 2).sum() + (n ** 2).sum()) / b


def check_finite(loss):
    """Numerical sanitizer mirroring ``_check_inf`` — returns a bool you can
    assert on host, without breaking jit."""
    return jnp.isfinite(loss)


def edge_drop_mask(key: jax.Array, num_edges: int, keep_rate: float):
    """Bernoulli keep mask (``EdgelistDrop``, ``modules/utils.py:44-52``)."""
    if keep_rate >= 1.0:
        return jnp.ones((num_edges,), dtype=bool)
    return jax.random.bernoulli(key, keep_rate, (num_edges,))


def hash_edge_mask(key: jax.Array, edge_ids: jax.Array, keep_rate: float):
    """Keep mask from a stateless integer hash of the *edge id*.

    Same drop semantics as :func:`edge_drop_mask`, but the mask is a pure
    elementwise function of ``(key, edge id)`` — so the fused propagation
    backward can evaluate the SAME mask in sender order by hashing
    ``graph.send_perm`` instead of gathering a materialized mask through a
    2M-element scalar permute (18 ms on v5e; the hash is ~free).
    Finalizer is the murmur3-style avalanche — plenty for dropout.
    """
    if keep_rate >= 1.0:
        return jnp.ones(edge_ids.shape, dtype=bool)
    salt = jax.random.randint(key, (), jnp.iinfo(jnp.int32).min,
                              jnp.iinfo(jnp.int32).max).astype(jnp.uint32)
    x = edge_ids.astype(jnp.uint32) * jnp.uint32(0x9E3779B9) + salt
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    # clamp: keep_rate in (1 - 2**-33, 1.0) would round to 2**32 and wrap
    # the uint32 threshold to 0, dropping every edge instead of none
    thresh = min(round(keep_rate * 4294967296.0), 4294967295)
    return x < jnp.uint32(thresh)


@partial(jax.jit, static_argnames=("num_nodes",))
def relative_time_encoding(edge_times: jax.Array, receivers: jax.Array,
                           num_nodes: int,
                           edge_mask: jax.Array | None = None,
                           max_step=None) -> jax.Array:
    """Per-destination softmax over min-max-rescaled edge times
    (``modules/RAGraph.py:250-263``). Masked edges get probability 0."""
    t = edge_times.astype(jnp.float32)
    if edge_mask is not None:
        big = jnp.where(edge_mask, t, -jnp.inf).max()
        small = jnp.where(edge_mask, t, jnp.inf).min()
    else:
        big, small = t.max(), t.min()
    if max_step is not None:
        big = jnp.asarray(max_step, jnp.float32)
    t = (t - small) / jnp.maximum(big - small, 1e-12)
    return segment_softmax(t, receivers, num_nodes, mask=edge_mask)


@partial(jax.jit, static_argnames=("num_nodes", "num_layers", "impl",
                                   "bf16", "interpret"))
def lightgcn_propagate(all_emb: jax.Array, senders: jax.Array,
                       receivers: jax.Array, weights: jax.Array,
                       num_nodes: int, num_layers: int,
                       recv_indptr: jax.Array | None = None,
                       impl: str = "scatter",
                       weights_send: jax.Array | None = None,
                       recv_of_send: jax.Array | None = None,
                       send_indptr: jax.Array | None = None,
                       bf16: bool = True, interpret: bool = False):
    """LightGCN layers; returns the list [h0, h1, ..., hL].

    One gather + VPU scale + segment reduction per layer
    (``modules/RAGraph.py:232-240``); dropped edges carry zero weight.

    ``impl="fused"`` (receiver-sorted edges + the sender-order
    auxiliaries + ``weights_send``) uses the custom-VJP fused op
    (:func:`ragraph_tpu.ops.pallas_segment.gather_scale_segsum`): bf16
    gathers (3x) and a gather+sorted-reduce backward instead of XLA's
    scatter-add transpose (1.7x) — measured ~3x per layer end-to-end on
    v5e at 2M x 64. Weights must be parameter-independent on this path
    (they are, in every model here).

    ``impl="sorted"`` uses the Pallas streaming-prefix-sum reduction for
    the forward only (~2x over scatter-add); ``"scatter"`` is plain XLA.
    """
    use_fused = (impl == "fused" and recv_indptr is not None
                 and weights_send is not None and recv_of_send is not None
                 and send_indptr is not None)
    # "fused" without the auxiliaries degrades to the sorted forward
    use_sorted = (impl in ("sorted", "fused") and not use_fused
                  and recv_indptr is not None)
    if use_fused:
        from ragraph_tpu.ops.pallas_segment import gather_scale_segsum
    elif use_sorted:
        from ragraph_tpu.ops.pallas_segment import sorted_segment_sum_grad
    layers = [all_emb]
    for _ in range(num_layers):
        if use_fused:
            layers.append(gather_scale_segsum(
                layers[-1], weights, weights_send, senders, recv_indptr,
                recv_of_send, send_indptr, bf16=bf16, interpret=interpret))
            continue
        # barrier the gather result so XLA cannot fuse the scale into the
        # row gather (a fused gather+multiply runs ~1.6x slower on v5e —
        # docs/KERNEL_NOTES.md); the multiply stays in XLA so weights
        # remain differentiable on this AD-safe path
        rows = jax.lax.optimization_barrier(layers[-1][senders])
        msgs = rows * weights[:, None]
        if use_sorted:
            layers.append(sorted_segment_sum_grad(msgs, recv_indptr,
                                                  receivers,
                                                  interpret=interpret))
        else:
            layers.append(jax.ops.segment_sum(msgs, receivers,
                                              num_segments=num_nodes))
    return layers
