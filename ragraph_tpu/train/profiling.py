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


def op_profile(fn, *args, iters: int = 3, min_ms: float = 0.05,
               trace_dir: str = "/tmp/ragraph_opprofile") -> list[dict]:
    """Per-op device self-times for ``fn(*args)`` via xprof.

    Captures a trace of ``iters`` calls (synced through a scalar pull —
    on tunneled platforms ``block_until_ready`` returns before device
    compute finishes), converts it with xprof's ``framework_op_stats``,
    and returns ``[{"type", "name", "occurrences", "ms_per_call"}, ...]``
    sorted by cost, filtered to ops above ``min_ms``. This is the
    ground-truth instrument behind every kernel decision in
    docs/KERNEL_NOTES.md / STATUS.md.

    Requires the ``xprof`` package (installed here); raises ImportError
    otherwise.
    """
    import glob
    import json as _json
    import shutil

    from xprof.convert import raw_to_tool_data as r2t

    shutil.rmtree(trace_dir, ignore_errors=True)
    r = fn(*args)                                  # compile + warm
    float(jnp.ravel(jax.tree.leaves(r)[0])[0])
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            r = fn(*args)
        float(jnp.ravel(jax.tree.leaves(r)[0])[0])
    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    data, _ = r2t.xspace_to_tool_data(files, "framework_op_stats", {})
    rows = _json.loads(data.decode())[0]["rows"]
    out = []
    for row in rows:
        c = [x["v"] for x in row["c"]]
        hod, typ, name, occ, self_us = c[1], c[2], c[3], c[4], c[7]
        if hod != "Device" or typ == "IDLE":
            continue
        ms = self_us / iters / 1000.0
        if ms >= min_ms:
            out.append({"type": typ, "name": str(name),
                        "occurrences": occ, "ms_per_call": round(ms, 4)})
    return sorted(out, key=lambda d: -d["ms_per_call"])


# Compile-time memory analyses recorded by EdgeTrainer (and any other
# caller) when RAGRAPH_MEM_ANALYSIS=1. `device.memory_stats()` reports
# zeros through the tunneled-TPU backend, so XLA's per-program
# `compiled.memory_analysis()` is the only honest HBM accounting here —
# same approach as the koubei vanilla dryrun (docs/SCALING.md).
MEMORY_ANALYSES: list[dict] = []


def record_memory_analysis(tag: str, ma, log=print) -> dict:
    """Append one compiled-program memory analysis (bytes) and log it."""
    entry = {"tag": tag}
    for field in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
        entry[field.replace("_size_in_bytes", "_bytes")] = int(
            getattr(ma, field, 0) or 0)
    # live-bytes estimate for the program: args + temps + outputs, minus
    # buffers aliased onto inputs (donated optimizer state)
    entry["live_bytes"] = (entry["argument_bytes"] + entry["temp_bytes"]
                           + entry["output_bytes"] - entry["alias_bytes"])
    MEMORY_ANALYSES.append(entry)
    log(f"[mem] {tag}: temp {entry['temp_bytes'] / 2**30:.3f} GiB, "
        f"args {entry['argument_bytes'] / 2**30:.3f} GiB, "
        f"out {entry['output_bytes'] / 2**30:.3f} GiB, "
        f"live {entry['live_bytes'] / 2**30:.3f} GiB")
    return entry


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
