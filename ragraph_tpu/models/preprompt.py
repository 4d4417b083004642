"""Pretraining model (PrePrompt).

Parity target: ``RAGraph_node/preprompt.py:29-66`` — a shared GCN stack
with DGI / GraphCL / Lp heads. Only the Lp contrastive tuple loss is live
in the reference training loss (``preprompt.py:50-55``); the DGI/GraphCL
heads exist as capabilities and are exposed here as optional losses.

TPU notes:
- ``inference`` is the frozen encoder used everywhere downstream: one GCN
  pass, no BN/dropout (``preprompt.py:64-66``).
- ``get_subgraph_3`` — the reference's O(E) Python loop over 3-hop
  neighborhoods (``preprompt.py:8-27``) — becomes two MXU matmuls:
  ``A3 = (A@A@A) > 0``; ``mean = (A3 @ h) / rowsum(A3)``.
- negative sampling (``prompt_pretrain_sample``, ``preprompt.py:106-126``)
  is vectorized with Gumbel top-k instead of per-row numpy shuffles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from ragraph_tpu.nn.heads import DGIHead, GraphCLHead, LpHead, compare_loss
from ragraph_tpu.nn.layers import avg_readout
from ragraph_tpu.nn.stack import GCNStack


def subgraph3_mean(h: jax.Array, adj: jax.Array,
                   node_mask: jax.Array | None = None) -> jax.Array:
    """Mean of features over ≤3-hop neighborhoods (matmul formulation)."""
    a3 = jnp.dot(adj, jnp.dot(adj, adj))
    reach = (a3 > 0).astype(h.dtype)
    if node_mask is not None:
        m = node_mask.astype(h.dtype)
        reach = reach * m[:, None] * m[None, :]
    cnt = reach.sum(axis=1, keepdims=True)
    return jnp.dot(reach, h) / jnp.maximum(cnt, 1.0)


def _masked_bce(logits: jax.Array, node_mask: jax.Array | None):
    """BCE-with-logits over [positives ∥ negatives] discriminator output
    (labels 1 for the first half, 0 for the second), padding-masked."""
    n = logits.shape[0] // 2
    labels = jnp.concatenate([jnp.ones((n,)), jnp.zeros((n,))])
    per = jnp.maximum(logits, 0) - logits * labels \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if node_mask is None:
        return per.mean()
    m = jnp.concatenate([node_mask, node_mask]).astype(per.dtype)
    return jnp.sum(per * m) / jnp.maximum(m.sum(), 1.0)


def corrupt_features(key: jax.Array, features: jax.Array,
                     node_mask: jax.Array | None = None) -> jax.Array:
    """DGI corruption: shuffle node feature rows.

    With a mask (real rows packed first, padding after — the layout of
    :func:`dense_batch_from_graphs`): sorting random Gumbel scores with
    padding forced last maps every real position to a uniformly random
    real row and every padded position to a padded row.
    """
    n = features.shape[0]
    if node_mask is None:
        return features[jax.random.permutation(key, n)]
    g = jax.random.gumbel(key, (n,))
    idx = jnp.argsort(jnp.where(node_mask, g, jnp.inf))
    return features[idx]


class PrePrompt(fnn.Module):
    """GCN encoder + pretraining heads (Lp live; DGI/GraphCL optional)."""

    hidden: int = 256
    num_layers: int = 1
    dropout: float = 0.3

    def setup(self):
        self.gcn = GCNStack(self.hidden, self.num_layers, self.dropout)
        self.lp = LpHead(self.hidden)
        self.dgi = DGIHead(self.hidden)
        self.graphcl_edge = GraphCLHead(self.hidden)
        self.graphcl_mask = GraphCLHead(self.hidden)

    def __call__(self, features, adj, tuples, node_mask=None, *,
                 deterministic: bool = False):
        """Lp pretraining loss (the reference's live loss path,
        ``preprompt.py:50-55``): GCN in LP mode → ELU → compareloss."""
        h = self.gcn(features, adj, node_mask, lp=True,
                     deterministic=deterministic)
        logits = self.lp(h)
        return compare_loss(logits, tuples, temperature=1.5,
                            row_mask=node_mask)

    def dgi_loss_logits(self, features, shuf_features, adj, node_mask=None):
        """DGI discriminator logits over clean vs corrupted features."""
        h_1 = self.gcn(features, adj, node_mask)
        h_2 = self.gcn(shuf_features, adj, node_mask)
        return self.dgi(h_1, h_2, node_mask)

    def graphcl_loss_logits(self, features, shuf_features, adj,
                            aug_adj1, aug_adj2, node_mask=None):
        """GraphCL (edge-augmentation flavor) discriminator logits."""
        h_0 = self.gcn(features, adj, node_mask)
        h_2 = self.gcn(shuf_features, adj, node_mask)
        h_a1 = self.gcn(features, aug_adj1, node_mask)
        h_a2 = self.gcn(features, aug_adj2, node_mask)
        return self.graphcl_edge(h_0, h_2, h_a1, h_a2, node_mask)

    def graphcl_flavor_loss(self, features, shuf_features, adj,
                            view1, view2, node_mask=None, *,
                            flavor: str = "edge"):
        """GraphCL loss for any aug flavor (edge / mask / node / subgraph).

        ``view1``/``view2`` are ``(features, adj, mask)`` triples from
        :func:`ragraph_tpu.rag.make_graphcl_views`; the head wiring per
        flavor matches ``GraphCL.forward``
        (``RAGraph_node/models/graphcl.py:21-41``). Flavors ``edge`` /
        ``node`` / ``subgraph`` share the ``graphcledge`` head and ``mask``
        uses ``graphclmask``, mirroring the two head instances the
        reference constructs (``preprompt.py:33-34``).
        """
        h_0 = self.gcn(features, adj, node_mask)
        h_2 = self.gcn(shuf_features, adj, node_mask)
        f1, a1, m1 = view1
        f2, a2, m2 = view2
        h_a1 = self.gcn(f1, a1, m1)
        h_a2 = self.gcn(f2, a2, m2)
        head = self.graphcl_mask if flavor == "mask" else self.graphcl_edge
        logits = head(h_0, h_2, h_a1, h_a2, node_mask,
                      view_masks=(m1, m2))
        return _masked_bce(logits, node_mask)

    def init_all(self, features, adj, tuples, node_mask=None):
        """Touch every head so all parameters materialize at init (flax
        only creates params for called submodules; the reference keeps
        DGI/GraphCL/Lp in the state_dict even though only Lp is live)."""
        loss = self(features, adj, tuples, node_mask, deterministic=True)
        _ = self.dgi_loss_logits(features, features, adj, node_mask)
        _ = self.graphcl_loss_logits(features, features, adj, adj, adj,
                                     node_mask)
        _ = self.graphcl_flavor_loss(features, features, adj,
                                     (features, adj, node_mask),
                                     (features, adj, node_mask),
                                     node_mask, flavor="mask")
        return loss

    def dgi_loss(self, features, shuf_features, adj, node_mask=None):
        """Masked BCE DGI loss over clean-vs-corrupted logits.

        The reference constructs this head (``preprompt.py:32,39``) with
        ``BCEWithLogitsLoss`` but leaves it out of the live loss; here it
        is a first-class optional pretraining objective.
        """
        logits = self.dgi_loss_logits(features, shuf_features, adj,
                                      node_mask)
        return _masked_bce(logits, node_mask)

    def graphcl_loss(self, features, shuf_features, adj, aug_adj1, aug_adj2,
                     node_mask=None):
        """Masked BCE GraphCL (edge-augmentation) loss."""
        logits = self.graphcl_loss_logits(features, shuf_features, adj,
                                          aug_adj1, aug_adj2, node_mask)
        return _masked_bce(logits, node_mask)

    def inference(self, features, adj, node_mask=None):
        """Frozen node embeddings (``preprompt.py:64-66``)."""
        return self.gcn(features, adj, node_mask, lp=False,
                        deterministic=True)

    def embed(self, features, adj, node_mask=None):
        """(node embeddings, 3-hop-readout summary) — ``preprompt.py:57-62``."""
        h = self.inference(features, adj, node_mask)
        sub3 = subgraph3_mean(h, adj, node_mask)
        c = avg_readout(sub3, node_mask)
        return h, c

    # Fewshot encode/decode split (RAGraph_node_fewshot/preprompt.py:73-78).
    def encode(self, features, adj, node_mask=None):
        return self.gcn(features, adj, node_mask, lp=False,
                        deterministic=True, stop_at=1)

    def decode(self, hidden, adj, node_mask=None):
        return self.gcn.decode_from(hidden, adj, node_mask, start=1)


def prompt_pretrain_sample(adj: np.ndarray, n: int,
                           rng: np.random.Generator,
                           node_mask: np.ndarray | None = None) -> np.ndarray:
    """Sample ``(pos, neg_1..neg_n)`` index tuples per node, vectorized.

    Parity with ``prompt_pretrain_sample`` (``preprompt.py:106-126``):
    column 0 is a uniformly random *neighbor* (the node itself if it has
    none); columns 1..n are distinct random *non-neighbors*. Sampling
    without replacement is done with Gumbel top-k over masked scores —
    no per-row Python loops.

    ``adj`` is the raw (un-normalized) binary adjacency. Padded rows (mask
    False) sample themselves everywhere; their loss rows are masked out.
    """
    num = adj.shape[0]
    n = min(n, num - 1)
    is_neigh = adj > 0
    if node_mask is not None:
        is_neigh = is_neigh & node_mask[None, :] & node_mask[:, None]

    g1 = rng.gumbel(size=(num, num))
    pos_scores = np.where(is_neigh, g1, -np.inf)
    pos = pos_scores.argmax(axis=1)
    has_neigh = is_neigh.any(axis=1)
    pos = np.where(has_neigh, pos, np.arange(num))

    g2 = rng.gumbel(size=(num, num))
    non_neigh = ~is_neigh
    if node_mask is not None:
        # negatives must be real nodes; padded anchor rows fall back to
        # self via the -inf substitution below (and are loss-masked anyway)
        non_neigh = non_neigh & node_mask[None, :]
    neg_scores = np.where(non_neigh, g2, -np.inf)
    order = np.argpartition(-neg_scores, kth=min(n, num - 1) - 1, axis=1)
    negs = order[:, :n]
    # rows with too few valid negatives: replace -inf picks with self
    picked_invalid = ~np.isfinite(
        np.take_along_axis(neg_scores, negs, axis=1))
    negs = np.where(picked_invalid, np.arange(num)[:, None], negs)

    return np.concatenate([pos[:, None], negs], axis=1).astype(np.int32)
