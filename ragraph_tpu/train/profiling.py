"""Profiling and numerical-sanity hooks.

The reference has only wall-clock prints (SURVEY.md §5). TPU-native
first-class observability:

- :func:`phase` — named wall-clock timer context (also emits a
  ``jax.profiler.TraceAnnotation`` so phases show up in xprof traces);
- :func:`start_trace` / :func:`stop_trace` — programmatic profiler capture;
- :func:`annotate` — decorator adding trace annotations to hot functions;
- :func:`assert_all_finite` — device-side finiteness sweep over a pytree
  (the ``_check_inf`` analog, ``RAGraph_edge/modules/base_model.py:23-32``).
"""

from __future__ import annotations

import contextlib
import functools
import time

import jax
import jax.numpy as jnp


_PHASE_TIMES: dict[str, float] = {}


@contextlib.contextmanager
def phase(name: str, log=None):
    """Wall-clock + xprof annotation for a named phase."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    _PHASE_TIMES[name] = _PHASE_TIMES.get(name, 0.0) + dt
    if log is not None:
        log(f"[phase] {name}: {dt:.3f}s (total {_PHASE_TIMES[name]:.3f}s)")


def phase_totals() -> dict:
    return dict(_PHASE_TIMES)


def annotate(name: str | None = None):
    """Decorator: wrap a function in a profiler TraceAnnotation."""

    def deco(fn):
        label = name or fn.__name__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with jax.profiler.TraceAnnotation(label):
                return fn(*args, **kwargs)

        return wrapper

    return deco


def start_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)


def stop_trace():
    jax.profiler.stop_trace()


def tree_all_finite(tree) -> jax.Array:
    """Scalar bool: every leaf of the pytree is finite."""
    leaves = [jnp.isfinite(x).all() for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(True)
    return jnp.stack(leaves).all()


def assert_all_finite(tree, what: str = "tree"):
    """Host-side assert mirroring ``_check_inf`` (raises ValueError)."""
    if not bool(tree_all_finite(tree)):
        raise ValueError(f"non-finite values detected in {what}")
