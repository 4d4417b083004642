"""Device-mesh helpers.

The reference has no distributed code (SURVEY.md: a commented-out NCCL stub
at ``RAGraph_graph/pretrain.py:23-26`` is all there is). The TPU-native
scale-out design is:

- ``dp``  — data parallelism over graphs / query batches (ICI);
- ``idx`` — the retrieval-index axis: library rows sharded across devices,
  local top-k + global merge (see ``sharded_index.py``);
- ``dcn`` — optional slice-major data parallelism across pod slices
  (``make_multislice_mesh``): only the once-per-step gradient all-reduce
  crosses the slow DCN links; retrieval collectives stay on ICI.

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


def make_multislice_mesh(num_slices: int | None = None,
                         dp: int | None = None, idx: int | None = None,
                         devices=None) -> Mesh:
    """Build a ``(dcn, dp, idx)`` mesh for multi-slice (pod) training.

    Axis layout follows the ICI/DCN split: ``dcn`` is the slice-major data
    -parallel axis (gradient all-reduce rides the slow cross-slice DCN
    links — the one collective per step that tolerates it), while ``dp``
    and ``idx`` stay *within* a slice so retrieval all-gathers and row
    scatters ride ICI. Batch leaves shard over the combined
    ``("dcn", "dp")`` axes (see :func:`dp_spec`); library rows shard over
    ``idx`` exactly as on a flat mesh.

    On real multi-slice TPU (devices expose ``slice_index``), devices are
    grouped so each ``dcn`` row is one physical slice, via
    ``mesh_utils.create_hybrid_device_mesh``. Anywhere else (CPU tests,
    single slice) a plain reshape emulates the topology.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_slices is None:
        slice_ids = {getattr(d, "slice_index", 0) for d in devices}
        num_slices = len(slice_ids)
    if n % num_slices:
        raise ValueError(f"{n} devices not divisible into {num_slices} "
                         f"slices")
    per_slice = n // num_slices
    if dp is None and idx is None:
        dp, idx = 1, per_slice
    elif dp is None:
        dp = per_slice // idx
    elif idx is None:
        idx = per_slice // dp
    if dp * idx != per_slice:
        raise ValueError(f"dp*idx = {dp}*{idx} != {per_slice} "
                         f"devices per slice")

    multi_slice = len({getattr(d, "slice_index", 0) for d in devices}) > 1
    if multi_slice:
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, dp, idx), dcn_mesh_shape=(num_slices, 1, 1),
            devices=devices)
    else:
        arr = np.asarray(devices).reshape(num_slices, dp, idx)
    return Mesh(arr, ("dcn", "dp", "idx"))


def dp_spec(mesh: Mesh) -> P:
    """The PartitionSpec for batch leading axes on this mesh: ``("dcn",
    "dp")`` on a multi-slice mesh, plain ``"dp"`` on a flat one."""
    return P(("dcn", "dp")) if "dcn" in mesh.axis_names else P("dp")


def shard_rows(mesh: Mesh, x: jax.Array, axis_name: str = "idx") -> jax.Array:
    """Place ``x`` with rows sharded over ``axis_name``."""
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))


def replicate(mesh: Mesh, x):
    """Fully replicate a pytree over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))
