"""Device-mesh helpers.

The reference has no distributed code (SURVEY.md: a commented-out NCCL stub
at ``RAGraph_graph/pretrain.py:23-26`` is all there is). The TPU-native
scale-out design is:

- ``dp``  — data parallelism over graphs / query batches (ICI, or DCN
  across slices);
- ``idx`` — the retrieval-index axis: library rows sharded across devices,
  local top-k + global merge (see ``sharded_index.py``).

All collectives are XLA (psum / all_gather) — no NCCL/MPI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, idx: int | None = None,
              devices=None) -> Mesh:
    """Build a ``(dp, idx)`` mesh over the available devices.

    Defaults: all devices on ``idx`` (retrieval sharding) if only one axis
    is wanted; otherwise the requested factorization.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None and idx is None:
        dp, idx = 1, n
    elif dp is None:
        dp = n // idx
    elif idx is None:
        idx = n // dp
    if dp * idx != n:
        raise ValueError(f"dp*idx = {dp}*{idx} != {n} devices")
    arr = np.asarray(devices).reshape(dp, idx)
    return Mesh(arr, ("dp", "idx"))


def shard_rows(mesh: Mesh, x: jax.Array, axis_name: str = "idx") -> jax.Array:
    """Place ``x`` with rows sharded over ``axis_name``."""
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))


def replicate(mesh: Mesh, x):
    """Fully replicate a pytree over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))
