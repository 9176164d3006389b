"""Extend the §2 gather cost model to the GB size class: 16B-row gathers
([2^26, 4] u32) vs 8B u64 element gathers ([2^27]) from the same 1.07 GB,
plus the 67 MB displacement-class control. Decides whether a one-slot
8B-row CHD layout is worth a format change.

Usage: python tools/gather_gbclass_exp.py [n_queries_millions]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

NQ = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 8_520_000
ROWS_GB = 1 << 26


def timeit(fn, *a, n=5):
    np.asarray(fn(*a))
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn(*a))
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    idx = jax.device_put(rng.integers(0, ROWS_GB, size=NQ).astype(np.int32))
    idx2 = jax.device_put(rng.integers(0, 2 * ROWS_GB, size=NQ).astype(np.int32))

    raw = rng.integers(0, 2**64, size=2 * ROWS_GB, dtype=np.uint64)
    t4 = jax.device_put(raw.view(np.uint32).reshape(ROWS_GB, 4))

    @jax.jit
    def g4(t, i):
        r = jnp.take(t, i, axis=0)
        return jnp.sum(r[:, 0] ^ r[:, 3])

    ms4 = timeit(g4, t4, idx)
    print(f"1.07GB [2^26,4]u32 row gather: {ms4:7.1f} ms ({ms4*1e6/NQ:5.2f} ns/q)", flush=True)
    del t4

    t8 = jax.device_put(raw)

    @jax.jit
    def g8(t, i):
        r = jnp.take(t, i)
        return jnp.sum(r)

    ms8 = timeit(g8, t8, idx2)
    print(f"1.07GB u64 element gather:     {ms8:7.1f} ms ({ms8*1e6/NQ:5.2f} ns/q)", flush=True)
    del t8

    t1 = jax.device_put(
        raw[: (1 << 22) * 2].view(np.uint32).reshape(1 << 22, 4)
    )
    idx3 = jax.device_put(rng.integers(0, 1 << 22, size=NQ).astype(np.int32))

    @jax.jit
    def gd(t, i):
        r = jnp.take(t, i, axis=0)
        return jnp.sum(r[:, 0] ^ r[:, 2])

    msd = timeit(gd, t1, idx3)
    print(f"67MB [2^22,4]u32 row gather:   {msd:7.1f} ms ({msd*1e6/NQ:5.2f} ns/q)", flush=True)


if __name__ == "__main__":
    main()
