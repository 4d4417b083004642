"""Microbenchmark: what is the fastest way to gather 2M x 64 embedding
rows on TPU? (The fused edge propagation's cost is 6 such gathers per
train step — see STATUS.md.)

Variants:
  a. XLA random row gather, bf16 (current production path)
  b. XLA gather with SORTED indices (sender-order) + indices_are_sorted
  c. XLA random gather after degree-sort relabeling on a Zipf graph
     (locality: hot rows clustered at low ids)
  d. Pallas: in-VMEM dynamic gather (jnp.take inside the kernel) —
     capability + speed probe for a table chunk that fits VMEM
  e. Pallas: run-length expand (sorted gather as sequential table stream)

Run on the real chip:  python experiments/gather_microbench.py
"""

import functools
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
    """Force real device completion: on the tunneled axon platform
    ``block_until_ready`` returns before compute finishes — only a
    device->host transfer of a dependent value actually syncs."""
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

    # NOTE: the output must be the materialized (E, D) array — with a
    # linear reduction on top, XLA rewrites sum(t[idx]) into a
    # count-weighted table reduction and the gather disappears (measured
    # 2800 GB/s "gathered", i.e. above HBM peak).
    @jax.jit
    def gather_plain(t, i):
        return t[i]

    @jax.jit
    def gather_sorted(t, i):
        return jax.lax.gather(
            t, i[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, D), indices_are_sorted=True, unique_indices=False,
            mode="clip")

    print("device:", jax.devices()[0].device_kind)
    bw = lambda dt: E * D * 2 / dt / 1e9   # bf16 gathered bytes / s

    for name, fn, t, i in [
        ("a. random bf16          ", gather_plain, table_bf, idx_rand),
        ("a2 random f32           ", gather_plain, table, idx_rand),
        ("b. sorted bf16 (flagged)", gather_sorted, table_bf, idx_sorted),
        ("b2 sorted bf16 (plain)  ", gather_plain, table_bf, idx_sorted),
        ("c. zipf random bf16     ", gather_plain, table_bf, idx_zipf),
        ("c2 zipf degree-sorted   ", gather_plain, table_bf, idx_zipf_deg),
    ]:
        dt = timeit(fn, t, i)
        print(f"{name}: {dt*1e3:7.3f} ms  ({bw(dt):6.1f} GB/s gathered)")

    # d. Pallas in-VMEM dynamic gather capability probe ------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CH, B = 1 << 14, 1 << 13               # 16k-row chunk, 8k idx per block

    # Mosaic's lax.gather lowering (jax/_src/pallas/mosaic/lowering.py:2464)
    # supports ONLY tpu.dynamic_gather with indices.shape == operand.shape
    # (gather along dim 0 or 1, the other dim batched) — i.e.
    # take_along_axis where the output block equals the chunk shape.
    def make_sq(ch):
        def k_sq(idx_ref, chunk_ref, out_ref):
            idx2 = jnp.broadcast_to(idx_ref[:][:, None], (ch, D))
            out_ref[:] = jnp.take_along_axis(chunk_ref[:], idx2, axis=0)

        @jax.jit
        def call(chunk, idx):
            return pl.pallas_call(
                k_sq,
                grid=(E // ch,),
                in_specs=[
                    pl.BlockSpec((ch,), lambda j: (j,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ch, D), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((ch, D), lambda j: (j, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((E, D), chunk.dtype),
            )(idx, chunk)
        return call

    for ch in (256, 512, 1024, 2048, 8192):
        chunk = table_bf[:ch]
        idx_small = jnp.asarray(rng.integers(0, ch, E).astype(np.int32))
        ref = chunk[idx_small]
        try:
            call = make_sq(ch)
            out = call(chunk, idx_small)
            ok = bool(jnp.all(out == ref))
            dt = timeit(call, chunk, idx_small)
            print(f"d. pallas dyngather CH={ch:5d}: {dt*1e3:7.3f} ms "
                  f"({bw(dt):6.1f} GB/s) correct={ok}")
        except Exception as ex:  # noqa: BLE001
            print(f"d. pallas dyngather CH={ch:5d}: UNSUPPORTED "
                  f"({type(ex).__name__}: {str(ex)[:150]})")


if __name__ == "__main__":
    main()
