"""GCN stacks (the shared encoder).

Parity: ``GcnLayers`` (``RAGraph_node/models/gcnlayers.py:10-67``) — a stack
of dense GCN convs; in LP (pretrain) mode each layer is followed by
BatchNorm1d + Dropout. The fewshot variant splits the stack into
``encode`` (first layer) / ``decode`` (rest)
(``RAGraph_node_fewshot/models/gcnlayers.py:63-86``), which here is just
``__call__(..., stop_at=1)`` and ``decode_from``.

TPU notes: batch norm statistics are computed over *real* nodes only
(padding-masked), otherwise variable padding would perturb them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn

from ragraph_tpu.nn.layers import DenseGCN


class MaskedBatchNorm(fnn.Module):
    """BatchNorm over the node axis with a validity mask.

    Running stats follow torch BatchNorm1d semantics (momentum 0.1,
    eps 1e-5); masked rows contribute nothing to the batch statistics.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @fnn.compact
    def __call__(self, x, node_mask=None, *, use_running_average: bool = False):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        scale = self.param("scale", fnn.initializers.ones, (self.features,))
        bias = self.param("bias", fnn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if node_mask is None:
                cnt = jnp.asarray(x.shape[0], x.dtype)
                mean = jnp.mean(x, axis=0)
                var = jnp.mean((x - mean) ** 2, axis=0)
            else:
                m = node_mask.astype(x.dtype)[:, None]
                cnt = jnp.maximum(m.sum(), 1.0)
                mean = (x * m).sum(axis=0) / cnt
                var = (((x - mean) ** 2) * m).sum(axis=0) / cnt
            if (not self.is_initializing()
                    and self.is_mutable_collection("batch_stats")):
                # torch uses the unbiased variance for the running stat
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        out = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        if node_mask is not None:
            out = out * node_mask.astype(out.dtype)[:, None]
        return out


class GCNStack(fnn.Module):
    """``num_layers`` dense GCN convs; optional BN+dropout per layer (LP mode)."""

    hidden: int
    num_layers: int = 1
    dropout: float = 0.3
    act: str = "prelu"

    def setup(self):
        self.convs = [DenseGCN(self.hidden, act=self.act, name=f"conv_{i}")
                      for i in range(self.num_layers)]
        self.bns = [MaskedBatchNorm(self.hidden, name=f"bn_{i}")
                    for i in range(self.num_layers)]
        self.drop = fnn.Dropout(self.dropout)

    def __call__(self, x, adj, node_mask=None, *, lp: bool = False,
                 deterministic: bool = True, stop_at: int | None = None):
        """Run the stack; ``lp=True`` enables BN+dropout (pretrain mode).

        ``stop_at=k`` returns after the first ``k`` layers (fewshot
        ``encode`` split).
        """
        n_layers = self.num_layers if stop_at is None else stop_at
        for i in range(n_layers):
            x = self.convs[i](x, adj, node_mask)
            if lp:
                x = self.bns[i](x, node_mask,
                                use_running_average=deterministic)
                x = self.drop(x, deterministic=deterministic)
        return x

    def decode_from(self, x, adj, node_mask=None, *, start: int = 1,
                    lp: bool = False, deterministic: bool = True):
        """Apply layers ``start..num_layers`` (fewshot ``decode`` split)."""
        for i in range(start, self.num_layers):
            x = self.convs[i](x, adj, node_mask)
            if lp:
                x = self.bns[i](x, node_mask,
                                use_running_average=deterministic)
                x = self.drop(x, deterministic=deterministic)
        return x
