"""Checkpointing (params + library + optimizer state).

The reference checkpoints ``state_dict`` pickles on best metric
(``RAGraph_node/pretrain.py:93-97``, ``RAGraph_edge/utils/trainer.py:
131-133``) and reloads/merges them across stages
(``RAGraph_edge/finetune_rag.py:63-94``). TPU-native equivalent: orbax
PyTree checkpoints of whole train states (params, toy-graph library,
optimizer state), with a plain-numpy fallback writer.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree, use_orbax: bool = True) -> str:
    """Save a pytree. Orbax for directory checkpoints; pickle fallback."""
    if use_orbax and _HAS_ORBAX:
        path = os.path.abspath(path)
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, _to_host(tree), force=True)
        return path
    path = path if path.endswith(".pkl") else path + ".pkl"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_host(tree), f)
    return path


def restore_checkpoint(path: str, template=None, use_orbax: bool = True):
    """Restore a pytree saved by :func:`save_checkpoint`."""
    if use_orbax and _HAS_ORBAX and os.path.isdir(path):
        ckpt = ocp.PyTreeCheckpointer()
        if template is not None:
            return ckpt.restore(path, item=_to_host(template))
        return ckpt.restore(path)
    pkl = path if path.endswith(".pkl") else path + ".pkl"
    with open(pkl, "rb") as f:
        return pickle.load(f)


def restore_sharded(path: str, template, use_orbax: bool = True):
    """Restore a checkpoint onto the *template's* device placements.

    For multi-chip states (idx-sharded embedding tables / library rows,
    replicated params — see ``parallel/``): ``template`` is a live pytree
    whose leaves carry the target :class:`jax.sharding.Sharding`; every
    restored leaf is ``device_put`` onto the matching leaf's sharding, so
    a resumed run keeps the exact mesh layout it trained with. Leaves
    without a sharding (host numpy) pass through unchanged.

    The reference's analog is plain ``load_state_dict`` on one GPU
    (``RAGraph_edge/finetune_rag.py:63-94``); this is the mesh-aware
    TPU-native resume.
    """
    restored = restore_checkpoint(path, template=template,
                                  use_orbax=use_orbax)

    def place(t, x):
        sh = getattr(t, "sharding", None)
        return jax.device_put(x, sh) if sh is not None else x

    return jax.tree.map(place, template, restored)


class BestCheckpointKeeper:
    """Save-on-best helper (higher metric is better)."""

    def __init__(self, directory: str, name: str = "best",
                 use_orbax: bool = False):
        self.directory = directory
        self.name = name
        self.use_orbax = use_orbax
        self.best_metric = -float("inf")
        self.path = None

    def update(self, metric: float, tree) -> bool:
        if metric > self.best_metric:
            self.best_metric = metric
            self.path = save_checkpoint(
                os.path.join(self.directory, self.name),
                tree, use_orbax=self.use_orbax)
            return True
        return False
