"""One-hot MXU gather vs XLA dynamic gather at edge-propagation scale
(VERDICT r2 #6).

The edge train step's floor is six 2M-row gathers at XLA's per-row rate
(~385M rows/s, 5.2 ms each for 2M x 64 bf16; docs/KERNEL_NOTES.md). The
HBM floor for the same data movement is ~0.35 ms (read 32 MB table +
write 256 MB rows), so XLA's gather is ~15x off the light. This
experiment applies the repo's own phase-2 trick (ops/bucket_topk.py):
replace the dynamic gather with per-block one-hot matmuls on the MXU.

Layout: edges are SENDER-SORTED (the fused propagation already maintains
send_perm / send_indptr). Table rows are grouped into 128-row blocks;
each block's outgoing edges are a contiguous run of the sorted edge
stream. The stream is re-padded so block b's run starts at slot b*P
(P = per-block capacity): the kernel then reads table block b (128, D),
builds a (P, 128) one-hot from the local sender columns, and writes
onehot @ block — a pure MXU row-select, no dynamic addressing at all.

Capacity: P = next multiple of 8 above the max block load; uniform
random graphs at 2M/2048-block scale have max load ~1.3x the mean.
Power-law graphs would need a heavy-block fallback (XLA gather on the
overflow), not implemented here — this is a feasibility measurement.

Usage: python experiments/onehot_gather_bench.py   (real TPU)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, E = 1 << 18, 64, 2 << 20       # 262k rows, 2M edges (bench scale)
LANE = 128
ITERS = 30


def build(rng):
    senders = np.sort(rng.integers(0, N, E).astype(np.int32))
    nb = N // LANE
    block_of = senders // LANE
    counts = np.bincount(block_of, minlength=nb)
    p = int(-(-counts.max() // 128) * 128)   # lane-aligned block capacity
    # slot layout: block b's edges land at [b*p, b*p + counts[b])
    offs = np.zeros(nb + 1, np.int64)
    offs[1:] = np.cumsum(counts)
    slot = np.arange(E) - offs[block_of] + block_of.astype(np.int64) * p
    local_col = np.full(nb * p, LANE, np.int32)      # LANE = padding slot
    local_col[slot] = senders % LANE
    return senders, local_col.reshape(nb, p), p, counts


BPS = 8  # table blocks per grid step (2-D block specs need >=8 sublanes)


def onehot_gather_kernel(col_ref, tab_ref, out_ref):
    """(BPS, P) local cols + (BPS*128, D) table blocks -> (BPS*P, D)."""
    p = col_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, LANE), 1)
    for b in range(BPS):
        cols = col_ref[b, :]                           # (P,) int32
        onehot = (lane == cols[:, None]).astype(jnp.bfloat16)
        rows = jnp.dot(onehot, tab_ref[b * LANE:(b + 1) * LANE, :],
                       preferred_element_type=jnp.float32)
        out_ref[b * p:(b + 1) * p, :] = rows.astype(jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)
    senders, local_cols, p, counts = build(rng)
    nb = N // LANE
    print(f"N={N} E={E} blocks={nb} P={p} "
          f"(mean load {counts.mean():.0f}, max {counts.max()}) "
          f"padded stream {nb * p} slots ({nb * p / E:.2f}x)")

    table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    send_j = jnp.asarray(senders)
    cols_j = jnp.asarray(local_cols)                   # (nb, P)

    @jax.jit
    def xla_gather(tab, idx):
        return tab[idx]

    onehot = pl.pallas_call(
        onehot_gather_kernel,
        grid=(nb // BPS,),
        in_specs=[
            pl.BlockSpec((BPS, p), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BPS * LANE, D), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BPS * p, D), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * p, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    def onehot_call(cols, tab):
        return onehot(cols, tab)

    # correctness ON DEVICE (never np.asarray a 288 MB array through the
    # tunnel): gather the real slots back and compare; pull one scalar
    block_of = senders // LANE
    offs = np.zeros(nb + 1, np.int64)
    offs[1:] = np.cumsum(counts)
    slot = (np.arange(E) - offs[block_of]
            + block_of.astype(np.int64) * p).astype(np.int32)

    @jax.jit
    def check(cols, tab, idx, slot):
        ref = tab[idx]
        got = onehot_call(cols, tab)[slot]
        return (got != ref).sum()
    n_bad = int(check(cols_j, table, send_j, jnp.asarray(slot)))
    assert n_bad == 0, f"{n_bad} mismatched elements"
    print("correctness OK")

    def timeit(f, *args):
        jax.block_until_ready(f(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = f(*args)
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / ITERS)
        return min(ts)

    t_xla = timeit(xla_gather, table, send_j)
    t_one = timeit(jax.jit(onehot_call), cols_j, table)
    bytes_moved = E * D * 2 + N * D * 2
    print(f"XLA gather:    {t_xla*1e3:7.3f} ms "
          f"({E/t_xla/1e6:.0f} M rows/s, "
          f"{bytes_moved/t_xla/2**30:.0f} GiB/s effective)")
    print(f"one-hot MXU:   {t_one*1e3:7.3f} ms "
          f"({E/t_one/1e6:.0f} M rows/s) -> {t_xla/t_one:.2f}x")


if __name__ == "__main__":
    main()
