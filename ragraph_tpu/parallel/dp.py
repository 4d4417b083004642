"""Data-parallel training over the ``dp`` mesh axis.

Strategy: params replicated, batch leading axis sharded over ``dp``,
library rows sharded over ``idx``; one ``jit`` with ``NamedSharding``
annotations lets XLA insert the gradient ``psum`` and the retrieval
collectives over ICI. (DCN data parallelism across slices is the same code
with a DCN-major mesh axis.)
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_batch(mesh: Mesh, batch, axis_name=None):
    """Shard every leaf's leading axis over the data-parallel axes.

    Defaults to ``("dcn", "dp")`` on a multi-slice mesh and ``"dp"`` on a
    flat one (see :func:`ragraph_tpu.parallel.mesh.dp_spec`). Leaves that
    cannot shard that way — scalars, or a leading axis the dp extent does
    not divide (e.g. ``DenseGraph.num_graphs``) — are replicated instead.
    """
    from ragraph_tpu.parallel.mesh import dp_spec
    spec = dp_spec(mesh) if axis_name is None else P(axis_name)
    axes = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
    extent = int(np.prod([mesh.shape[a] for a in axes]))
    s = NamedSharding(mesh, spec)
    repl = NamedSharding(mesh, P())

    def place(x):
        ok = getattr(x, "ndim", 0) >= 1 and x.shape[0] % extent == 0
        return jax.device_put(x, s if ok else repl)

    return jax.tree.map(place, batch)


def make_dp_train_step(mesh: Mesh, loss_fn: Callable, optimizer):
    """Build a jitted replicated-params / sharded-batch SGD step.

    ``loss_fn(params, batch, key) -> scalar`` must compute a MEAN over the
    batch axis so the value (and its gradients) are equivalent to the
    single-device computation. Params/opt-state stay replicated (out
    shardings pinned), so XLA emits the all-reduce for grads — there is no
    per-axis knob here; the batch's own sharding (``shard_batch``) decides
    which mesh axes the reduction crosses.
    """
    import optax  # local import to keep module load light

    repl = NamedSharding(mesh, P())

    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, out_shardings=(repl, repl, repl))
