"""Core GNN layers (flax.linen).

Parity targets:
- dense GCN layer ``prelu(adj @ (x W) + b)`` —
  ``RAGraph_node/layers/gcn.py:5-41`` (Xavier W, zero bias, PReLU);
- masked mean readout — ``RAGraph_node/layers/readout.py:6-15``;
- bilinear discriminator — ``RAGraph_node/layers/discriminator.py:4-32``;
- dense multi-head GAT — ``RAGraph_node/layers/gat.py:5-46``.

TPU notes: every layer is shape-static and mask-aware (padded nodes are
forced to zero so they stay inert through deeper layers); the GCN is a
single ``(N,N)@(N,H)`` MXU matmul; the GAT materializes pairwise scores via
broadcast add instead of the reference's ``N²``-row concat + matvec, which
removes an O(N²·2H) memory blow-up and maps the score computation onto the
VPU directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn

xavier_uniform = fnn.initializers.glorot_uniform()


class PReLU(fnn.Module):
    """Parametric ReLU with torch's default slope init (0.25), one shared slope."""

    init_slope: float = 0.25

    @fnn.compact
    def __call__(self, x):
        slope = self.param("slope", lambda _k: jnp.asarray(self.init_slope, jnp.float32))
        return jnp.where(x >= 0, x, slope * x)


class DenseGCN(fnn.Module):
    """One dense GCN conv: ``act(adj @ (x W) + b)``.

    ``adj`` is the pre-normalized (padded) adjacency from
    :func:`ragraph_tpu.core.graph.normalize_adj_dense`.
    """

    features: int
    use_bias: bool = True
    act: str = "prelu"  # "prelu" | "relu" | "none"

    @fnn.compact
    def __call__(self, x, adj, node_mask=None):
        h = fnn.Dense(self.features, use_bias=False,
                      kernel_init=xavier_uniform)(x)
        out = jnp.dot(adj, h, preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", fnn.initializers.zeros, (self.features,))
            out = out + b
        if self.act == "prelu":
            out = PReLU()(out)
        elif self.act == "relu":
            out = jax.nn.relu(out)
        if node_mask is not None:
            out = out * node_mask.astype(out.dtype)[:, None]
        return out


def avg_readout(seq: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Masked mean pooling over the node axis.

    Matches ``AvgReadout`` (``RAGraph_node/layers/readout.py:10-15``): with a
    mask, ``sum(seq * msk) / sum(msk)``.
    """
    if mask is None:
        return jnp.mean(seq, axis=0)
    m = mask.astype(seq.dtype)[:, None]
    return jnp.sum(seq * m, axis=0) / jnp.maximum(jnp.sum(m), 1.0)


class BilinearDiscriminator(fnn.Module):
    """Bilinear scorer ``f_k(h, c) = h^T W c + b`` for DGI/GraphCL.

    Scores positive rows ``h_pl`` and corrupted rows ``h_mi`` against the
    summary ``c``; returns concatenated ``(N_pos + N_neg,)`` logits
    (reference: ``layers/discriminator.py:18-32``).
    """

    features: int

    @fnn.compact
    def __call__(self, c, h_pl, h_mi, s_bias1=None, s_bias2=None):
        w = self.param("bilinear_w", xavier_uniform,
                       (self.features, self.features))
        b = self.param("bilinear_b", fnn.initializers.zeros, ())
        cw = jnp.dot(c, w)  # (H,)
        sc_1 = h_pl @ cw + b
        sc_2 = h_mi @ cw + b
        if s_bias1 is not None:
            sc_1 = sc_1 + s_bias1
        if s_bias2 is not None:
            sc_2 = sc_2 + s_bias2
        return jnp.concatenate([sc_1, sc_2], axis=0)


class BilinearDiscriminator2(fnn.Module):
    """Bilinear scorer with a *per-row* context ``c``.

    Variant of :class:`BilinearDiscriminator` where ``c`` is ``(N, H)``
    (one context per node) instead of a shared summary
    (``RAGraph_node/layers/discriminator2.py:18-32``).
    """

    features: int

    @fnn.compact
    def __call__(self, c, h_pl, h_mi, s_bias1=None, s_bias2=None):
        w = self.param("bilinear_w", xavier_uniform,
                       (self.features, self.features))
        b = self.param("bilinear_b", fnn.initializers.zeros, ())
        sc_1 = jnp.sum((h_pl @ w) * c, axis=-1) + b
        sc_2 = jnp.sum((h_mi @ w) * c, axis=-1) + b
        if s_bias1 is not None:
            sc_1 = sc_1 + s_bias1
        if s_bias2 is not None:
            sc_2 = sc_2 + s_bias2
        return jnp.concatenate([sc_1, sc_2], axis=0)


class DenseGAT(fnn.Module):
    """Dense multi-head GAT over a padded adjacency.

    Behavioral parity with ``layers/gat.py:25-46`` but the pairwise score
    ``e_ij = leaky_relu(a^T [h_i || h_j])`` is decomposed into
    ``a_src·h_i + a_dst·h_j`` and formed by broadcast add — no ``(N², 2H)``
    concat materialization.
    """

    features: int
    num_heads: int = 1
    alpha: float = 0.2
    dropout: float = 0.0

    @fnn.compact
    def __call__(self, x, adj, node_mask=None, *, deterministic: bool = True):
        n = x.shape[0]
        w = self.param("W", xavier_uniform,
                       (x.shape[-1], self.features * self.num_heads))
        a = self.param("a", xavier_uniform, (2 * self.features, 1))
        h = (x @ w).reshape(n, self.num_heads, self.features)

        a_src = a[: self.features, 0]   # (F,)
        a_dst = a[self.features:, 0]
        src_score = jnp.einsum("nhf,f->nh", h, a_src)
        dst_score = jnp.einsum("nhf,f->nh", h, a_dst)
        e = src_score[:, None, :] + dst_score[None, :, :]   # (N, N, H)
        e = jax.nn.leaky_relu(e, negative_slope=self.alpha)

        mask = adj > 0
        if node_mask is not None:
            mask = mask & (node_mask[:, None] & node_mask[None, :])
        e = jnp.where(mask[:, :, None], e, -9e15)
        attn = jax.nn.softmax(e, axis=1)
        if self.dropout > 0 and not deterministic:
            attn = fnn.Dropout(self.dropout, deterministic=False)(attn)
        out = jnp.einsum("nmh,mhf->nhf", attn, h)
        out = out.reshape(n, self.num_heads * self.features)
        if node_mask is not None:
            out = out * node_mask.astype(out.dtype)[:, None]
        return out
