"""Microbenchmark: how fast can 2M x 64 embedding rows be gathered on
TPU? (The fused edge propagation is bound by six such gathers per train
step — see STATUS.md.)

Findings on v5e (this file reproduces them):
  - bf16 random row gather: ~5.2 ms (~52 GB/s of gathered bytes) —
    per-row-rate bound (~400-500M rows/s), NOT bandwidth bound.
  - f32 gather is ~4.6x slower than bf16 (XLA lowers them differently).
  - Sorted indices (with or without the indices_are_sorted flag) do NOT
    help; degree-sorted relabeling of a Zipf graph does NOT help — the
    per-row rate is insensitive to the access pattern.
  - A fused gather+convert/scale is ~1.6x slower than the pure gather —
    hence the optimization_barrier around the bf16 table cast in
    ops/pallas_segment.gather_scale_segsum.
  - Mosaic `tpu.dynamic_gather` (the only in-kernel gather the Pallas
    lowering supports, jax/_src/pallas/mosaic/lowering.py:2464) CRASHES
    the remote compiler (HTTP 500) at every (CH, D) config tried, so a
    VMEM-resident-chunk gather kernel is not currently buildable.

Absolute gather times swing ~2x run-to-run with chip state / live HBM
pressure (2.2-5.2 ms observed for the bf16 random gather); the RATIOS
(f32 penalty, fused-scale penalty, pattern insensitivity) are stable.

Timing on the tunneled axon platform: ``block_until_ready`` returns
before device compute finishes — only a device->host transfer of a
dependent value syncs, so every measurement pulls a scalar and subtracts
the measured tunnel roundtrip.

Run on the real chip:  python experiments/gather_microbench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 18          # table rows (256k)
D = 64
E = 1 << 21          # gathered rows (2M)
ITERS = 10

_ROUNDTRIP = None


def _sync_scalar(r):
    return float(jnp.ravel(r)[0])


def roundtrip_s():
    global _ROUNDTRIP
    if _ROUNDTRIP is None:
        x = jnp.ones((8, 8))
        for _ in range(3):
            _sync_scalar(x * 2)
        t0 = time.perf_counter()
        _sync_scalar(x * 3)
        _ROUNDTRIP = time.perf_counter() - t0
    return _ROUNDTRIP


def timeit(fn, *args):
    _sync_scalar(fn(*args))                # compile + warm
    rt = roundtrip_s()
    t0 = time.perf_counter()
    rs = [fn(*args) for _ in range(ITERS)]  # all kept alive; device is
    _sync_scalar(rs[-1])                    # in-order, so last sync = all
    return max((time.perf_counter() - t0 - rt), 1e-9) / ITERS


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    table_bf = table.astype(jnp.bfloat16)

    idx_rand = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    idx_sorted = jnp.sort(idx_rand)

    # Zipf sender draw (power-law popularity), then the same draw after
    # degree-sort relabeling (rank by frequency -> id)
    z = rng.zipf(1.3, size=4 * E)
    z = z[z <= N] - 1
    z = z[:E].astype(np.int64)
    counts = np.bincount(z, minlength=N)
    rank = np.empty(N, np.int64)
    rank[np.argsort(-counts, kind="stable")] = np.arange(N)
    idx_zipf = jnp.asarray(z.astype(np.int32))
    idx_zipf_deg = jnp.asarray(rank[z].astype(np.int32))

    # NOTE: the benchmarked function must RETURN the materialized (E, D)
    # array — with a linear reduction on top, XLA rewrites sum(t[idx])
    # into a count-weighted table reduction and the gather disappears.
    @jax.jit
    def gather_plain(t, i):
        return t[i]

    @jax.jit
    def gather_fused_scale(t, i, w):
        return (t.astype(jnp.bfloat16)[i].astype(jnp.float32)
                * w[:, None]).astype(jnp.bfloat16)

    w = jnp.asarray(rng.random(E).astype(np.float32))
    print("device:", jax.devices()[0].device_kind,
          f"(tunnel roundtrip {roundtrip_s()*1e3:.1f} ms)")
    table_i8 = jnp.clip(jnp.round(table * 16), -127, 127).astype(jnp.int8)
    table_wide = jnp.concatenate([table_bf, table_bf], axis=1)  # D=128
    for name, fn, args, nbytes in [
        ("random bf16           ", gather_plain, (table_bf, idx_rand), 2),
        ("random f32            ", gather_plain, (table, idx_rand), 4),
        ("random int8           ", gather_plain, (table_i8, idx_rand), 1),
        ("random bf16 D=128     ", gather_plain, (table_wide, idx_rand),
         4),  # 2 bytes x 2D: same total bytes as f32 row
        ("sorted bf16           ", gather_plain, (table_bf, idx_sorted), 2),
        ("zipf bf16             ", gather_plain, (table_bf, idx_zipf), 2),
        ("zipf degree-sorted    ", gather_plain, (table_bf, idx_zipf_deg),
         2),
        ("fused cast+scale bf16 ", gather_fused_scale,
         (table, idx_rand, w), 2),
    ]:
        dt = timeit(fn, *args)
        print(f"{name}: {dt*1e3:7.3f} ms  "
              f"({E*D*nbytes/dt/1e9:6.1f} GB/s gathered)")


if __name__ == "__main__":
    main()
