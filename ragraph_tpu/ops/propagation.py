"""k-hop feature propagation.

Reference semantics (``RAGraph_node/ragraph_utils/Propagation.py:7-26``):
row-normalize the (already symmetric-normalized) adjacency by its row sum,
then apply ``k`` rounds of ``relu(adj_norm @ x)``.

On TPU the dense variant is a chain of ``(N, N) @ (N, F)`` matmuls — pure
MXU work; XLA fuses the ReLU into the matmul epilogue. The edge variant is
the scalable path: gather + weighted segment-sum per hop, used by the
recsys pipeline (``RAGraph_edge/modules/RAGraph.py:232-240``).
"""

from __future__ import annotations

from functools import partial

import jax

from ragraph_tpu.core.graph import row_normalize_adj


@partial(jax.jit, static_argnames=("k", "relu"))
def aggregate_k_hop_dense(adj: jax.Array, x: jax.Array, k: int,
                          relu: bool = True) -> jax.Array:
    """``k`` rounds of ``relu(row_norm(adj) @ x)``. ``k`` is static.

    ``k`` is a small compile-time constant (≤3 in every reference config),
    so the loop is unrolled straight into the XLA graph — no scan overhead.
    """
    if k <= 0:
        return x
    adj_n = row_normalize_adj(adj)
    for _ in range(k):
        x = adj_n @ x
        if relu:
            x = jax.nn.relu(x)
    return x


@partial(jax.jit, static_argnames=("num_nodes", "k", "relu"))
def aggregate_k_hop_edges(senders: jax.Array, receivers: jax.Array,
                          weights: jax.Array, x: jax.Array,
                          num_nodes: int, k: int, relu: bool = True) -> jax.Array:
    """Edge-list variant: ``k`` rounds of weighted gather→segment-sum.

    ``weights`` should already include the desired normalization (row-norm
    or binorm); padding edges must carry zero weight.
    """
    for _ in range(k):
        msgs = x[senders] * weights[:, None]
        x = jax.ops.segment_sum(msgs, receivers, num_segments=num_nodes)
        if relu:
            x = jax.nn.relu(x)
    return x
