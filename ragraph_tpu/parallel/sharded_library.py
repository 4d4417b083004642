"""Building the toy-graph library directly on a row-sharded store.

``parallel/sharded_index.py`` already *retrieves* from a library whose rows
are sharded over the mesh's ``idx`` axis; this module makes the build /
append path itself shardable, so a 10M-row store never has to exist on one
device (the reference grows its store with ``torch.cat`` on a single GPU,
``RAGraph_node/ragraph_utils/ToyGraphBase.py:40-45``).

Design:

- The sharded store is a plain :class:`ToyGraphLibrary` whose arrays have
  exactly ``capacity`` rows (no dump row) laid out ``P('idx')`` — device
  ``d`` owns the contiguous *logical* rows ``[d*C/D, (d+1)*C/D)``. Row
  numbering is identical to the single-device store, so retrieval
  (``rag.library.retrieve`` under GSPMD, or the explicit
  ``sharded_index.sharded_cosine_topk``) and row-for-row comparisons work
  unchanged.
- **Append is a shard_map**: every device sees the (replicated) batch of
  new entries, computes the same global compacting positions
  ``fill + cumsum(valid) - valid``, and scatters only the rows that land in
  its own range; everything else is routed out of bounds and dropped
  (``mode='drop'`` replaces the single-device dump row). No entry data
  moves over ICI — each device writes from its replicated copy.
- The fill counter stays a replicated scalar: every device computes the
  identical ``min(fill + valid.sum(), capacity)``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ragraph_tpu.rag.library import (LibraryConfig, ToyGraphLibrary,
                                     build_library_with)


def sharded_library_init(mesh: Mesh, capacity: int, emb_size: int,
                         num_classes: int, num_anchors: int = 10,
                         axis_name: str = "idx") -> ToyGraphLibrary:
    """An empty store with rows sharded over ``axis_name``.

    Unlike :func:`ragraph_tpu.rag.library.library_init` there is no dump
    row — arrays are exactly ``(capacity, ...)`` so ``capacity`` can divide
    evenly over the axis. ``capacity`` must be a multiple of the axis size.
    """
    n_shards = mesh.shape[axis_name]
    if capacity % n_shards:
        raise ValueError(
            f"capacity {capacity} not divisible by {n_shards} '{axis_name}' "
            f"shards")
    rows = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def z(*shape):
        # Allocate under jit with out_shardings so XLA creates each shard
        # in place — eager jnp.zeros + device_put would materialize the
        # full (capacity, ...) array on device 0 first, which at 10M rows
        # x 128 dims is a 5 GB spike the sharded store exists to avoid.
        return jax.jit(partial(jnp.zeros, shape),
                       out_shardings=rows)()

    return ToyGraphLibrary(
        keys=z(capacity, emb_size),
        values=z(capacity, emb_size),
        labels=z(capacity, num_classes),
        positions=z(capacity, num_anchors),
        fill=jax.device_put(jnp.zeros((), jnp.int32), repl),
        capacity=capacity,
    )


@partial(jax.jit, static_argnames=("mesh", "axis_name"))
def _append_sharded(lib: ToyGraphLibrary, keys, values, labels, positions,
                    valid, *, mesh: Mesh, axis_name: str) -> ToyGraphLibrary:
    capacity = lib.capacity

    def local(lk, lv, ll, lp, fill, ks, vs, ys, ps, vld):
        rows_local = lk.shape[0]
        d = jax.lax.axis_index(axis_name)
        vi = vld.astype(jnp.int32)
        gpos = fill + jnp.cumsum(vi) - vi
        mine = vld & (gpos < capacity) & (gpos // rows_local == d)
        # rows that are invalid, overflow, or belong to another shard go to
        # index rows_local (out of bounds) and are dropped by the scatter.
        idx = jnp.where(mine, gpos - d * rows_local, rows_local)
        new_fill = jnp.minimum(fill + vi.sum(),
                               jnp.asarray(capacity, jnp.int32))
        return (lk.at[idx].set(ks, mode="drop"),
                lv.at[idx].set(vs, mode="drop"),
                ll.at[idx].set(ys, mode="drop"),
                lp.at[idx].set(ps, mode="drop"),
                new_fill)

    shard = P(axis_name)
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(shard, shard, shard, shard, P(), P(), P(), P(), P(), P()),
        out_specs=(shard, shard, shard, shard, P()),
        check_vma=False,  # fill is computed identically on every device
    )(lib.keys, lib.values, lib.labels, lib.positions, lib.fill,
      keys, values, labels, positions, valid)
    return dataclasses.replace(lib, keys=out[0], values=out[1],
                               labels=out[2], positions=out[3], fill=out[4])


def sharded_library_append(mesh: Mesh, lib: ToyGraphLibrary, keys, values,
                           labels, positions, valid,
                           axis_name: str = "idx") -> ToyGraphLibrary:
    """Compacting append onto a row-sharded store (see module docstring).

    Semantics match :func:`ragraph_tpu.rag.library.library_append`: valid
    rows pack densely after ``fill`` in global row order; invalid and
    overflow rows vanish instead of landing in a dump row.
    """
    return _append_sharded(lib, keys, values, labels, positions, valid,
                           mesh=mesh, axis_name=axis_name)


def build_sharded_library(mesh: Mesh, lib: ToyGraphLibrary,
                          encoder_fn: Callable, batches, cfg: LibraryConfig,
                          key: jax.Array,
                          axis_name: str = "idx") -> ToyGraphLibrary:
    """Sharded-store twin of :func:`ragraph_tpu.rag.library.build_library`.

    Entry *construction* (encode / sample / propagate / position codes) is
    the same jitted ``vmap`` over the graph batch and runs replicated; only
    the append scatters are sharded. Entries are tiny relative to the store
    (a batch of graphs vs up to 10M rows), so replicating them costs
    nothing while the store itself never materializes on one device.
    """
    return build_library_with(
        lib, encoder_fn, batches, cfg, key,
        append_fn=lambda l, *entries: sharded_library_append(
            mesh, l, *entries, axis_name=axis_name))
