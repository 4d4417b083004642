"""Seeding helpers.

Parity: ``seed_everything`` (``RAGraph_node/ragraph_utils/utility.py:5-16``)
/ ``init_seed`` (``RAGraph_edge/utility.py:7-14``). In JAX, determinism
comes from explicit PRNG keys; this seeds the host-side generators
(numpy / random) and returns a root jax key.
"""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int):
    """Seed host RNGs; returns (jax_root_key, numpy_generator).

    Unlike the reference's ``seed_everything`` we do NOT set
    ``PYTHONHASHSEED`` here: CPython reads it only at interpreter
    startup, so assigning it at runtime is a no-op — claiming
    hash-order determinism it cannot deliver.
    """
    random.seed(seed)
    np.random.seed(seed)
    import jax
    return jax.random.key(seed), np.random.default_rng(seed)
