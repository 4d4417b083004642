"""Pretraining heads and decoders.

Parity targets:
- ``Lp`` — ELU over the GCN output, learnable (unused-in-math) prompt
  (``RAGraph_node/models/LP.py:4-21``);
- ``DGI`` — prompt-scaled readout/discriminator head
  (``RAGraph_node/models/dgi.py:6-38``);
- ``GraphCL`` — same discriminator over augmented views
  (``RAGraph_node/models/graphcl.py:7-62``);
- ``LogReg`` — linear probe (``RAGraph_node/models/logreg.py:5-21``);
- ``TaskDecoder`` — Linear→LeakyReLU→Linear
  (``RAGraph_node/ragraph_utils/TaskDecoder.py:3-16``);
- ``compareloss`` — the only live pretraining loss: contrastive
  cosine loss over (positive, negatives) tuples
  (``RAGraph_node/preprompt.py:80-103``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn

from ragraph_tpu.nn.layers import BilinearDiscriminator, avg_readout, xavier_uniform
from ragraph_tpu.ops.similarity import l2_normalize


class TaskDecoder(fnn.Module):
    """2-layer MLP: Linear → LeakyReLU → Linear."""

    hidden: int
    out: int

    @fnn.compact
    def __call__(self, x):
        x = fnn.Dense(self.hidden)(x)
        x = jax.nn.leaky_relu(x, negative_slope=0.01)
        return fnn.Dense(self.out)(x)


class LogReg(fnn.Module):
    """Linear probe with Xavier weights / zero bias."""

    num_classes: int

    @fnn.compact
    def __call__(self, x):
        return fnn.Dense(self.num_classes, kernel_init=xavier_uniform)(x)


class LpHead(fnn.Module):
    """Link-prediction pretrain head: ``elu(gcn_out)`` (+ vestigial prompt).

    The reference keeps an Xavier-initialized ``(1, H)`` prompt parameter
    that never enters the forward math (``models/LP.py:8,14-17``); we keep
    it for checkpoint-shape parity.
    """

    hidden: int

    @fnn.compact
    def __call__(self, gcn_out):
        _ = self.param("prompt", xavier_uniform, (1, self.hidden))
        return jax.nn.elu(gcn_out)


class DGIHead(fnn.Module):
    """DGI discriminator head over clean vs corrupted node features."""

    hidden: int

    @fnn.compact
    def __call__(self, h_1, h_2, node_mask=None, samp_bias1=None, samp_bias2=None):
        prompt = self.param("prompt", xavier_uniform, (1, self.hidden))
        h_3 = h_1 * prompt
        h_4 = h_2 * prompt
        c = jax.nn.sigmoid(avg_readout(h_1, node_mask))
        return BilinearDiscriminator(self.hidden)(c, h_3, h_4,
                                                  samp_bias1, samp_bias2)


class GraphCLHead(fnn.Module):
    """GraphCL head: two augmented views scored against clean/corrupted.

    ``view_masks`` (optional pair) are the per-view node masks — node/
    subgraph augmentations shrink the graph, so their readout summaries
    must pool over the surviving nodes only (the reference's views are
    physically smaller tensors, ``models/graphcl.py:36-49``).
    """

    hidden: int

    @fnn.compact
    def __call__(self, h_0, h_2, h_aug1, h_aug2, node_mask=None,
                 view_masks=None):
        prompt = self.param("prompt", xavier_uniform, (1, self.hidden))
        disc = BilinearDiscriminator(self.hidden)
        m1, m2 = view_masks if view_masks is not None \
            else (node_mask, node_mask)
        h_00 = h_0 * prompt
        h_22 = h_2 * prompt
        c_1 = jax.nn.sigmoid(avg_readout(h_aug1 * prompt, m1))
        c_3 = jax.nn.sigmoid(avg_readout(h_aug2 * prompt, m2))
        return disc(c_1, h_00, h_22) + disc(c_3, h_00, h_22)


def compare_loss(features: jax.Array, tuples: jax.Array,
                 temperature: float = 1.5,
                 row_mask: jax.Array | None = None) -> jax.Array:
    """Contrastive tuple loss — parity with ``compareloss``
    (``RAGraph_node/preprompt.py:80-103``).

    ``tuples[i] = [pos, neg_1..neg_n]`` indexes rows of ``features``; the
    anchor is row ``i`` itself. Loss is
    ``-log( exp(cos(h_i, h_pos)) / sum_j exp(cos(h_i, h_neg_j)) )``
    averaged over anchors. (The reference divides both exp terms by the
    temperature, which cancels; kept for fidelity.)

    ``row_mask`` excludes padded anchors from the mean.
    """
    anchors = l2_normalize(features)                       # (N, H)
    gathered = l2_normalize(features[tuples])              # (N, 1+n, H)
    sim = jnp.einsum("nh,nkh->nk", anchors, gathered)
    exp = jnp.exp(sim) / temperature
    numerator = exp[:, 0]
    denominator = jnp.sum(exp[:, 1:], axis=1)
    losses = -jnp.log(numerator / jnp.maximum(denominator, 1e-12))
    if row_mask is not None:
        m = row_mask.astype(losses.dtype)
        return jnp.sum(losses * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(losses)
