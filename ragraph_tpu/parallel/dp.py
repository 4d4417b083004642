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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_batch(mesh: Mesh, batch, axis_name=None):
    """Shard every leaf's leading axis over the data-parallel axes.

    Defaults to ``("dcn", "dp")`` on a multi-slice mesh and ``"dp"`` on a
    flat one (see :func:`ragraph_tpu.parallel.mesh.dp_spec`).
    """
    from ragraph_tpu.parallel.mesh import dp_spec
    s = NamedSharding(mesh, dp_spec(mesh) if axis_name is None
                      else P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


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
