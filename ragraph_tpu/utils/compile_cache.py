"""Persistent XLA compilation cache.

The staged temporal pipelines rebuild models every stage; with the edge
arrays padded to one bucket (``load_edge_dataset(pad_edges_to=...)``) the
per-stage programs lower to identical HLO, so a persistent cache turns the
7 re-compilations of an 8-stage run (30-60 s each on the tunneled v5e)
into disk hits. Safe to enable unconditionally — keyed by HLO hash +
compiler version.
"""

from __future__ import annotations

import os

_DEFAULT = os.environ.get("RAGRAPH_JAX_CACHE", "/tmp/ragraph_jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent)."""
    import jax

    path = path or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
