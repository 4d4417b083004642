"""Seeding helpers.

Parity: ``seed_everything`` (``RAGraph_node/ragraph_utils/utility.py:5-16``)
/ ``init_seed`` (``RAGraph_edge/utility.py:7-14``). In JAX, determinism
comes from explicit PRNG keys; this seeds the host-side generators
(numpy / random / PYTHONHASHSEED) and returns a root jax key.
"""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int):
    """Seed host RNGs; returns (jax_root_key, numpy_generator)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    import jax
    return jax.random.key(seed), np.random.default_rng(seed)
